"""From-scratch pytree optimizer with the reference's exact update semantics.

Reproduces General/Optimizer.py as pure functions over param pytrees:

- decoupled (AdamW-style) weight decay applied multiplicatively to the params
  *before* the gradient step: ``p *= 1 - wd*lr`` (Optimizer.py:60-67), with
  batchnorm params exempt unless ``bn_wd=True``,
- global gradient-norm clipping over all trainable params combined
  (Optimizer.py:54-56, torch ``clip_grad_norm_`` semantics: scale by
  ``clip / (norm + 1e-6)`` when that is < 1),
- per-layer-group learning rates: each leaf's lr is looked up from a length-NL
  vector by its static group index (the analogue of the per-param-group python
  loop in Optimizer.py:50-52 — but resolved inside the jitted step, so
  schedules are just scalar inputs),
- optimizer families matching the reference registry (Learner.py:16-19):
  SGD, SGD_Mom (momentum 0.9), Adam (betas 0.9/0.999), Adam2 (betas 0.9/0.99),
  with torch's exact update rules (momentum buffer ``buf = m*buf + g``;
  Adam bias correction with the *current* beta values, as torch does when
  betas are rescheduled per batch).

Frozen leaves are skipped entirely — their params, momentum buffers, and Adam
step counts are untouched, matching torch behaviour where frozen params are
simply absent from the optimizer.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

from neuralnetworklibrary_tpu.core.partition import Partition
from neuralnetworklibrary_tpu.core.pytree import (
    broadcast_to_groups,
    flatten_params,
    global_norm,
    unflatten_params,
)


def newton_schulz_orthogonalize(m, steps: int = 5, eps: float = 1e-7):
    """≈ UVᵀ of a 2-d matrix via the quintic Newton–Schulz iteration
    (Muon's core): X ← aX + (bA + cA²)X with A = XXᵀ and the tuned
    coefficients (3.4445, −4.7750, 2.0315), X₀ = m/‖m‖_F.  Five iterations
    drive every singular value into ≈(0.7, 1.3) — an approximate polar
    factor using only matmuls (MXU-native; no SVD on device).  Operates on
    the smaller Gram orientation (transpose when rows > cols)."""
    a, b, c = 3.4445, -4.7750, 2.0315
    x = jnp.asarray(m, jnp.float32)
    flip = x.shape[0] > x.shape[1]
    if flip:
        x = x.T
    x = x / (jnp.linalg.norm(x) + eps)
    for _ in range(steps):
        gram = x @ x.T
        x = a * x + (b * gram + c * gram @ gram) @ x
    return x.T if flip else x


class Optimizer:
    """Optimizer with per-layer-group hyperparameters, decoupled weight decay,
    and global grad clipping.

    Mirrors the reference ``Optimizer`` constructor surface
    (Optimizer.py:36-39): ``Optimizer(opt_func, wd=None, bn_wd=True,
    clip=None)`` where ``opt_func`` is a name from :data:`opt_dict` —
    'SGD' | 'SGD_Mom' | 'Adam' | 'Adam2' | 'default'.  Unlike the reference it
    holds no model: state lives in an explicit opt_state pytree and
    :meth:`apply` is a pure function suitable for use inside ``jax.jit``.
    """

    def __init__(self, opt_func: str = "default", wd=None, bn_wd: bool = True, clip=None):
        if opt_func not in opt_dict:
            raise ValueError(f"unknown optimizer {opt_func!r}; choose from {list(opt_dict)}")
        cfg = opt_dict[opt_func]
        self.name = opt_func
        self.kind: str = cfg["kind"]  # 'sgd' | 'adam' | 'lamb' | 'adafactor'
        self.momentum: float = cfg.get("momentum", 0.0)
        self.betas: tuple[float, float] = cfg.get("betas", (0.9, 0.999))
        self.eps: float = 1e-8
        # Adafactor (Shazeer & Stern 2018) knobs — optax.adafactor defaults,
        # so the differential test in tests/test_adafactor.py pins exactness.
        self.decay_rate: float = 0.8          # v decay: 1 - t^-decay_rate
        self.clip_threshold: float = 1.0      # per-leaf update-RMS clip
        self.min_dim_size_to_factor: int = 128
        self.param_scale: bool = True         # lr is relative: x max(RMS(p), 1e-3)
        self.factored_eps: float = 1e-30      # grad^2 regularizer
        # Mutable bookkeeping mirroring reference attributes (set_params :41-52).
        self.wd = wd
        self.bn_wd = bn_wd
        self.clip = clip

    @staticmethod
    def _factored_dims(shape, min_dim: int):
        """The two largest axes to factor the second moment over, or None.

        Returns (d1, d0) = (second-largest, largest) axis indices when the
        second-largest dim is >= min_dim (optax _factored_dims semantics);
        vectors/scalars and small matrices keep a full v.
        """
        if len(shape) < 2:
            return None
        import numpy as _np

        order = _np.argsort(shape)
        if shape[order[-2]] < min_dim:
            return None
        return int(order[-2]), int(order[-1])

    # -- hyperparameter bookkeeping (host side) -----------------------------

    def set_params(self, wd=None, bn_wd=None, clip=None):
        """Update the training-period hyperparameters (Learner.init_optimizer
        semantics, Learner.py:680-688: unspecified values keep their last
        setting)."""
        if wd is not None:
            self.wd = wd
        if bn_wd is not None:
            self.bn_wd = bn_wd
        if clip is not None:
            self.clip = clip

    @property
    def uses_momentum(self) -> bool:
        return self.kind == "sgd" and self.momentum != 0.0

    @property
    def uses_betas(self) -> bool:
        return self.kind in ("adam", "lamb", "muon", "lion")

    @property
    def factored(self) -> bool:
        return self.kind == "adafactor"

    # -- functional state ---------------------------------------------------

    def init(self, params: Mapping) -> dict:
        """Create a fresh opt_state pytree for ``params``.

        Note the reference *re-creates* its optimizer (losing all state) on
        every freeze/unfreeze/bn_freeze (Learner.py:241,246,263,271); Learner
        mirrors that by calling this again at those points.
        """
        def mk(params):
            flat = flatten_params(params)
            state: dict = {}
            for path, leaf in flat.items():
                zeros = jnp.zeros_like(leaf)
                if self.kind == "sgd":
                    state[path] = {"buf": zeros}
                elif self.kind == "lion":
                    # single momentum buffer — half of Adam's state; the
                    # sign() update needs no second moment
                    state[path] = {"m": zeros}
                elif self.kind in ("adam", "lamb"):
                    state[path] = {
                        "m": zeros,
                        "v": zeros,
                        "t": jnp.zeros((), jnp.int32),
                    }
                elif self.kind == "muon":
                    # 2-d matmul weights get the orthogonalized-momentum
                    # update (a single momentum buffer); embeddings and
                    # non-2-d leaves (biases, norms) take AdamW — Muon's
                    # spectral geometry only makes sense for genuine
                    # matrices (Jordan et al. 2024 route those to Adam too).
                    if leaf.ndim == 2 and not any(
                            "embed" in str(p) for p in path):
                        state[path] = {"mu": zeros,
                                       "t": jnp.zeros((), jnp.int32)}
                    else:
                        state[path] = {"m": zeros, "v": zeros,
                                       "t": jnp.zeros((), jnp.int32)}
                elif self.kind == "adafactor":
                    # Sublinear memory: >=2-d leaves whose second-largest dim
                    # clears min_dim_size_to_factor store row/col RMS vectors
                    # instead of a full second moment (the (V, D) embedding's
                    # state shrinks from V*D to V+D floats).
                    fd = self._factored_dims(leaf.shape,
                                             self.min_dim_size_to_factor)
                    if fd is not None:
                        d1, d0 = fd
                        vr_shape = tuple(s for a, s in enumerate(leaf.shape)
                                         if a != d0)
                        vc_shape = tuple(s for a, s in enumerate(leaf.shape)
                                         if a != d1)
                        state[path] = {
                            "v_row": jnp.zeros(vr_shape, leaf.dtype),
                            "v_col": jnp.zeros(vc_shape, leaf.dtype),
                            "t": jnp.zeros((), jnp.int32),
                        }
                    else:
                        state[path] = {"v": zeros,
                                       "t": jnp.zeros((), jnp.int32)}
                else:
                    raise AssertionError(self.kind)
            return unflatten_params(state)

        # Materialize through jit so every leaf gets its own device buffer —
        # bare jnp.zeros constants can alias, which breaks donation in the
        # train step ("attempt to donate the same buffer twice").
        return jax.jit(mk)(params)

    # -- the pure update ----------------------------------------------------

    def apply(
        self,
        params: Mapping,
        grads: Mapping,
        opt_state: Mapping,
        partition: Partition,
        trainable: Sequence[bool],
        lr_groups: jax.Array,
        mom=None,
        beta1=None,
        beta2=None,
        wd_groups=None,
        bn_wd: bool | None = None,
        clip=None,
    ):
        """One optimizer step.  Pure; call inside jit.

        lr_groups: (NL,) learning rate per layer group (already including any
            last-batch rescaling).  mom / beta1 / beta2: traced scalars
            overriding the constructor defaults (for per-batch schedules).
        wd_groups: (NL,) decoupled weight decay per group, or None.
        clip: global grad-norm clip value (traced scalar or python float), or
            None.  bn_wd / trainable / partition must be Python constants.
        """
        if bn_wd is None:
            bn_wd = self.bn_wd
        pf = flatten_params(params)
        gf = flatten_params(grads)
        sf = flatten_params(opt_state)

        paths = partition.paths
        idx_of = {p: i for i, p in enumerate(paths)}
        lr_groups = jnp.asarray(lr_groups, jnp.float32)
        if wd_groups is not None:
            wd_groups = jnp.asarray(wd_groups, jnp.float32)

        mom = self.momentum if mom is None else mom
        b1 = self.betas[0] if beta1 is None else beta1
        b2 = self.betas[1] if beta2 is None else beta2

        # 1) decoupled weight decay: p *= 1 - wd*lr (Optimizer.py:60-67),
        #    applied to trainable non-bn params, and to bn params iff bn_wd.
        #    LAMB instead folds wd into the trust-ratio update (step 3), per
        #    the paper: the ratio must see ||m̂/√v̂ + wd·p||.
        if wd_groups is not None and self.kind != "lamb":
            for path in paths:
                i = idx_of[path]
                if not trainable[i]:
                    continue
                if partition.is_bn[i] and not bn_wd:
                    continue
                g = partition.group_idx[i]
                pf[path] = pf[path] * (1.0 - wd_groups[g] * lr_groups[g])

        # 2) global grad-norm clipping over trainable leaves (Optimizer.py:54-56).
        if clip is not None:
            tleaves = [gf[p] for p in paths if trainable[idx_of[p]]]
            norm = global_norm(tleaves)
            scale = jnp.minimum(1.0, clip / (norm + 1e-6))
            for path in paths:
                if trainable[idx_of[path]]:
                    gf[path] = gf[path] * scale

        # 3) the gradient step, per leaf.
        new_p, new_s = dict(pf), {}
        sf_by_leaf = {}
        for path in paths:
            # opt_state was flattened one level deeper (slot names).
            sf_by_leaf[path] = {
                key[-1]: val for key, val in sf.items() if key[:-1] == path
            }
        for path in paths:
            i = idx_of[path]
            slots = sf_by_leaf[path]
            if not trainable[i]:
                new_s[path] = slots
                continue
            lr = lr_groups[partition.group_idx[i]]
            g = gf[path]
            p = pf[path]
            if self.kind == "sgd":
                buf = slots["buf"] * mom + g if mom is not None else g
                new_p[path] = p - lr * buf
                new_s[path] = {"buf": buf}
            elif self.kind == "lion":
                # Lion (Chen et al. 2023, "Symbolic Discovery of Optimization
                # Algorithms"): sign of a b1-interpolated momentum drives the
                # step; the buffer itself decays with b2.  Decoupled wd rides
                # the shared pre-step path (step 1): p*(1-wd·lr) - lr·sign(u)
                # == optax.lion's add_decayed_weights formulation exactly.
                u = jnp.sign(b1 * slots["m"] + (1.0 - b1) * g)
                new_p[path] = p - lr * u
                new_s[path] = {"m": b2 * slots["m"] + (1.0 - b2) * g}
            elif self.kind == "lamb":
                # LAMB (You et al. 2020): Adam moments, then a per-leaf
                # trust ratio ||p|| / ||update|| scales the step — layer-wise
                # adaptive lr that keeps large-batch training stable.
                t = slots["t"] + 1
                m = b1 * slots["m"] + (1.0 - b1) * g
                v = b2 * slots["v"] + (1.0 - b2) * jnp.square(g)
                tf = t.astype(jnp.float32)
                m_hat = m / (1.0 - jnp.power(b1, tf))
                v_hat = v / (1.0 - jnp.power(b2, tf))
                upd = m_hat / (jnp.sqrt(v_hat) + self.eps)
                if wd_groups is not None and (bn_wd or not partition.is_bn[i]):
                    upd = upd + wd_groups[partition.group_idx[i]] * p
                p_norm = jnp.linalg.norm(p.ravel())
                u_norm = jnp.linalg.norm(upd.ravel())
                trust = jnp.where((p_norm > 0.0) & (u_norm > 0.0),
                                  p_norm / jnp.maximum(u_norm, 1e-12), 1.0)
                new_p[path] = p - lr * trust * upd
                new_s[path] = {"m": m, "v": v, "t": t}
            elif self.kind == "muon":
                if "mu" in slots:
                    # Muon (Jordan et al. 2024): nesterov momentum, then
                    # Newton–Schulz orthogonalization — the update becomes
                    # ~UVᵀ of the momentum matrix, equalizing the step's
                    # singular values (pure MXU matmuls, TPU-friendly);
                    # √(rows/cols) keeps per-row RMS comparable across
                    # aspect ratios.
                    mu = mom * slots["mu"] + g
                    o = newton_schulz_orthogonalize(g + mom * mu)
                    scale = jnp.sqrt(jnp.maximum(
                        1.0, p.shape[0] / p.shape[1]))
                    new_p[path] = p - lr * scale * o
                    new_s[path] = {"mu": mu, "t": slots["t"] + 1}
                else:
                    # AdamW fallback for embeddings / non-matrix leaves —
                    # identical math to kind='adam' below
                    t = slots["t"] + 1
                    m = b1 * slots["m"] + (1.0 - b1) * g
                    v = b2 * slots["v"] + (1.0 - b2) * jnp.square(g)
                    tf = t.astype(jnp.float32)
                    m_hat = m / (1.0 - jnp.power(b1, tf))
                    v_hat = v / (1.0 - jnp.power(b2, tf))
                    new_p[path] = p - lr * m_hat / (jnp.sqrt(v_hat) + self.eps)
                    new_s[path] = {"m": m, "v": v, "t": t}
            elif self.kind == "adafactor":
                # Adafactor (Shazeer & Stern 2018), optax.adafactor semantics:
                # factored second-moment RMS scaling, per-leaf update-RMS clip,
                # relative (parameter-scale) step size.  Decoupled wd rides the
                # shared pre-step path (step 1) like the other optimizers.
                t = slots["t"] + 1
                beta = 1.0 - jnp.power(t.astype(jnp.float32),
                                       -self.decay_rate)
                gsq = jnp.square(g) + self.factored_eps
                fd = self._factored_dims(p.shape, self.min_dim_size_to_factor)
                if fd is not None:
                    d1, d0 = fd
                    v_row = beta * slots["v_row"] + (1.0 - beta) * jnp.mean(gsq, axis=d0)
                    v_col = beta * slots["v_col"] + (1.0 - beta) * jnp.mean(gsq, axis=d1)
                    # normalized outer-product reconstruction: the row factor
                    # is divided by its mean so row x col has the right scale
                    reduced_d1 = d1 - 1 if d1 > d0 else d1
                    row_mean = jnp.mean(v_row, axis=reduced_d1, keepdims=True)
                    row_factor = (v_row / row_mean) ** -0.5
                    col_factor = v_col ** -0.5
                    upd = (g * jnp.expand_dims(row_factor, axis=d0)
                           * jnp.expand_dims(col_factor, axis=d1))
                    new_slots = {"v_row": v_row, "v_col": v_col, "t": t}
                else:
                    v = beta * slots["v"] + (1.0 - beta) * gsq
                    upd = g * v ** -0.5
                    new_slots = {"v": v, "t": t}
                if self.clip_threshold is not None:
                    rms_u = jnp.sqrt(jnp.mean(jnp.square(upd)))
                    upd = upd / jnp.maximum(1.0, rms_u / self.clip_threshold)
                step = lr * upd
                if self.param_scale:
                    # relative step: scale by max(RMS(p), 1e-3) so lr means
                    # "fraction of the weight's own magnitude" (the paper's
                    # alpha_t; optax scale_by_param_block_rms)
                    p_rms = jnp.maximum(jnp.sqrt(jnp.mean(jnp.square(p))), 1e-3)
                    step = step * p_rms
                new_p[path] = p - step
                new_s[path] = new_slots
            else:  # adam
                t = slots["t"] + 1
                m = b1 * slots["m"] + (1.0 - b1) * g
                v = b2 * slots["v"] + (1.0 - b2) * jnp.square(g)
                tf = t.astype(jnp.float32)
                m_hat = m / (1.0 - jnp.power(b1, tf))
                v_hat = v / (1.0 - jnp.power(b2, tf))
                new_p[path] = p - lr * m_hat / (jnp.sqrt(v_hat) + self.eps)
                new_s[path] = {"m": m, "v": v, "t": t}

        out_state = {path + (slot,): val for path, slots in new_s.items() for slot, val in slots.items()}
        return unflatten_params(new_p), unflatten_params(out_state)

    def lr_vector(self, lr, n_groups: int):
        """Broadcast an lr spec (scalar or per-group list) to an (NL,) array."""
        return jnp.asarray(broadcast_to_groups(lr, n_groups), jnp.float32)

    # ------------------------------------------------------------ diagnostics

    def print_summary(self, partition, trainable=None):
        """Per-layer-group parameter summary — the optimizer-state inspection
        diagnostic (Optimizer.print_summary, Optimizer.py:72-84)."""
        n_groups = partition.n_groups
        counts = [0] * n_groups
        for i, path in enumerate(partition.paths):
            counts[partition.group_idx[i]] += 1
        print(f"optimizer: {self.kind}  wd={self.wd}  bn_wd={self.bn_wd}  clip={self.clip}")
        for g in range(n_groups):
            t = ""
            if trainable is not None:
                n_train = sum(1 for i in range(len(partition.paths))
                              if partition.group_idx[i] == g and trainable[i])
                t = f"  trainable_leaves={n_train}"
            print(f"  group {g}: {counts[g]} param leaves{t}")

    def print_params_grads(self, params, grads, max_leaves: int = 20):
        """Per-leaf |param| / |grad| norms — Optimizer.print_params_grads
        (Optimizer.py:86-96)."""
        import numpy as np

        pf = flatten_params(params)
        gf = flatten_params(grads)
        for n, (path, p) in enumerate(pf.items()):
            if n >= max_leaves:
                print(f"... ({len(pf) - max_leaves} more)")
                break
            g = gf.get(path)
            gn = float(jnp.linalg.norm(g.ravel())) if g is not None else float("nan")
            print(f"{'/'.join(path):60s} |p|={float(jnp.linalg.norm(p.ravel())):.4e} |g|={gn:.4e}")


# Optimizer registry — mirrors opt_dict (Learner.py:16-19).
opt_dict: dict[str, dict] = {
    "SGD": {"kind": "sgd", "momentum": 0.0},
    "SGD_Mom": {"kind": "sgd", "momentum": 0.9},
    "Adam": {"kind": "adam", "betas": (0.9, 0.999)},
    "Adam2": {"kind": "adam", "betas": (0.9, 0.99)},
    # beyond reference parity: layer-wise adaptive optimizer for large-batch
    # training (LAMB, You et al. 2020) — the natural pairing for the
    # data-parallel mesh + grad_accum effective-batch scaling
    "LAMB": {"kind": "lamb", "betas": (0.9, 0.999)},
    # beyond reference parity: orthogonalized-momentum optimizer for matmul
    # weights (Muon, Jordan et al. 2024) — the current speed-record LLM
    # pretraining optimizer; 2-d weights take Newton–Schulz-orthogonalized
    # nesterov-momentum steps (5 matmul iterations, MXU-native), embeddings
    # and non-matrix leaves fall back to AdamW.  Typical lr ~0.02 for the
    # matrix groups.
    "Muon": {"kind": "muon", "momentum": 0.95, "betas": (0.9, 0.999)},
    # beyond reference parity: sublinear-memory adaptive optimizer (Adafactor,
    # Shazeer & Stern 2018) — the TPU-era standard for large embedding/LM
    # training; factored leaves store O(n+m) second-moment state, the natural
    # companion to FSDP when even sharded Adam moments are too big
    "Adafactor": {"kind": "adafactor"},
    # beyond reference parity: sign-momentum optimizer (Lion, Chen et al.
    # 2023) — half of Adam's optimizer state (one buffer, no second moment)
    # and a bandwidth-light elementwise update; typical lr ~3-10x smaller
    # than Adam's with ~3-10x larger wd.
    "Lion": {"kind": "lion", "betas": (0.9, 0.99)},
}
opt_dict["default"] = opt_dict["SGD_Mom"]
