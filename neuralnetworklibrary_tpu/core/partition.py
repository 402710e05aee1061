"""Static param partitioning: layer groups, batchnorm detection, freeze masks.

The reference implements differential learning rates and freezing by mutating
module state: ``model.layer_groups`` (lists of nn.Modules),
``separate_bn_layers`` splitting each group into non-bn/bn halves
(General/Core.py:181-207), and ``requires_grad`` flips for freeze/unfreeze/
bn_freeze (General/Learner.py:237-272).

On TPU everything must be resolvable at trace time, so the same machinery
becomes a *static* description of the flattened param pytree:

- each param leaf gets a layer-group index (→ per-group lr/wd looked up inside
  the jitted step),
- a boolean ``is_bn`` flag (→ weight-decay exemption, Optimizer.py:61-67, and
  bn freezing),
- a boolean ``in_head`` flag (→ ``freeze()`` trains only the head,
  Learner.py:237-241, and ``bn_freeze('non_head')`` exempts head bns).

Trainability is then a pure function of (frozen?, bn_frozen-mode) over these
static flags — frozen leaves get ``stop_gradient`` applied inside the step so
XLA dead-code-eliminates their entire backward graph (the analogue of
``requires_grad=False`` skipping backward).

Partition instances are hashable so they can close over jitted functions as
static metadata.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Mapping, Sequence

from neuralnetworklibrary_tpu.core.pytree import Path, flatten_params

PathPrefix = tuple[str, ...]


def _normalize_prefix(p) -> PathPrefix:
    if isinstance(p, str):
        return tuple(p.split("/")) if p else ()
    return tuple(p)


def _starts_with(path: Path, prefix: PathPrefix) -> bool:
    return path[: len(prefix)] == prefix


@dataclass(frozen=True)
class Partition:
    """Immutable description of a model's param pytree partitioning."""

    paths: tuple[Path, ...]          # all param leaf paths, sorted
    group_idx: tuple[int, ...]       # layer-group index per leaf
    is_bn: tuple[bool, ...]          # normalization-layer param?
    in_head: tuple[bool, ...]        # under the model's head submodule?
    n_groups: int

    def trainable_mask(
        self, frozen: bool = False, bn_frozen: str | None = None
    ) -> tuple[bool, ...]:
        """Trainability per leaf under the reference's freezing rules.

        ``frozen=True``  → only head params train (Learner.freeze, :237-241).
        ``bn_frozen='all'``      → no bn params train (Learner.bn_freeze, :248-264).
        ``bn_frozen='non_head'`` → bn params train only in the head.
        """
        if bn_frozen not in (None, "all", "non_head"):
            raise ValueError(f"bn_frozen must be None, 'all', or 'non_head', got {bn_frozen!r}")
        out = []
        for bn, head in zip(self.is_bn, self.in_head):
            t = True
            if frozen and not head:
                t = False
            if bn_frozen == "all" and bn:
                t = False
            if bn_frozen == "non_head" and bn and not head:
                t = False
            out.append(t)
        return tuple(out)

    def group_of(self, path: Path) -> int:
        return self.group_idx[self.paths.index(path)]


def detect_bn_paths(params: Mapping, batch_stats: Mapping | None) -> set[Path]:
    """Param leaves belonging to normalization layers with running statistics.

    In flax, a BatchNorm module contributes ``params[...bn]['scale'/'bias']``
    and ``batch_stats[...bn]['mean'/'var']`` at the same module path — so a
    param leaf is a bn param iff its parent module path also appears in the
    batch_stats collection.  This replaces the reference's isinstance check
    against ``bn_types`` (Core.py:137).
    """
    if not batch_stats:
        return set()
    stats_parents = {p[:-1] for p in flatten_params(batch_stats)}
    return {p for p in flatten_params(params) if p[:-1] in stats_parents}


def build_partition(
    params: Mapping,
    batch_stats: Mapping | None = None,
    layer_groups: Sequence[Sequence[PathPrefix | str]] | None = None,
    head_prefixes: Sequence[PathPrefix | str] = ("head",),
) -> Partition:
    """Build a Partition from a model's variables.

    ``layer_groups`` is a list of groups, each a list of path prefixes into the
    params tree (strings may use '/' separators).  Every leaf must be covered
    by exactly one group; the longest matching prefix wins, so nested prefixes
    are allowed.  ``None`` means one group containing the whole model — the
    analogue of ``make_model_basic`` (Core.py:199).
    """
    flat = flatten_params(params)
    paths = tuple(flat.keys())

    if layer_groups is None:
        layer_groups = [[()]]
    norm_groups = [[_normalize_prefix(p) for p in g] for g in layer_groups]
    heads = [_normalize_prefix(p) for p in head_prefixes]

    group_idx = []
    for path in paths:
        best: tuple[int, int] | None = None  # (prefix_len, group)
        for g, prefixes in enumerate(norm_groups):
            for pref in prefixes:
                if _starts_with(path, pref):
                    cand = (len(pref), g)
                    if best is None or cand[0] > best[0]:
                        best = cand
        if best is None:
            raise ValueError(
                f"param leaf {'/'.join(path)} is not covered by any layer group"
            )
        group_idx.append(best[1])

    bn_paths = detect_bn_paths(params, batch_stats)
    is_bn = tuple(p in bn_paths for p in paths)
    in_head = tuple(any(_starts_with(p, h) for h in heads) for p in paths)

    return Partition(
        paths=paths,
        group_idx=tuple(group_idx),
        is_bn=is_bn,
        in_head=in_head,
        n_groups=len(norm_groups),
    )
