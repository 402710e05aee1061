"""Differential validation of the from-scratch mAP against the reference's
own implementation (Vision.py:1696-1800), extracted from the read-only
checkout via AST (importing all of Vision.py would pull the full torch app
stack; mAP1/mAP/jaccard are self-contained given numpy + torch + a TEN
stub)."""

import ast
import contextlib
import io
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_VISION = "/root/reference/Applications/Vision.py"
pytestmark = pytest.mark.skipif(not os.path.isfile(REF_VISION),
                                reason="reference checkout not available")

from neuralnetworklibrary_tpu.applications.detection import mAP  # noqa: E402

_ns = None


def _ref_mAP():
    """Exec just jaccard/mAP1/mAP from the reference source as oracles."""
    global _ns
    if _ns is not None:
        return _ns["mAP"]
    src = open(REF_VISION).read()
    tree = ast.parse(src)
    wanted = {"jaccard", "mAP1", "mAP"}
    keep = [n for n in tree.body
            if isinstance(n, (ast.FunctionDef,)) and n.name in wanted]
    assert {n.name for n in keep} == wanted
    mod = ast.Module(body=keep, type_ignores=[])
    ns = {
        "np": np, "torch": torch,
        "TEN": lambda x: torch.as_tensor(np.asarray(x, np.float32)),
        "COCO_thresholds": [0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85,
                            0.9, 0.95],
    }
    exec(compile(mod, REF_VISION, "exec"), ns)
    _ns = ns
    return ns["mAP"]


def _random_case(seed, n_imgs=6, n_cats=3):
    rng = np.random.default_rng(seed)
    targets, predictions = [], []
    for i in range(n_imgs):
        tl = []
        for _ in range(int(rng.integers(0, 4))):
            x, y = rng.uniform(0, 80, 2)
            w, h = rng.uniform(8, 40, 2)
            tl.append((np.asarray([x, y, x + w, y + h], np.float32),
                       int(rng.integers(0, n_cats))))
        targets.append(tl)
        pb, pc, cs = [], [], []
        for _ in range(int(rng.integers(0, 6))):
            if tl and rng.random() < 0.6:
                b, c = tl[int(rng.integers(0, len(tl)))]
                b = b + rng.normal(0, 4, 4).astype(np.float32)
                b[2] = max(b[2], b[0] + 2)
                b[3] = max(b[3], b[1] + 2)
            else:
                x, y = rng.uniform(0, 80, 2)
                w, h = rng.uniform(8, 40, 2)
                b = np.asarray([x, y, x + w, y + h], np.float32)
                c = int(rng.integers(0, n_cats))
            pb.append(b)
            pc.append(int(c) if rng.random() < 0.85
                      else int(rng.integers(0, n_cats)))
            cs.append(round(float(rng.uniform(0.05, 1.0)), 1))  # ties
        predictions.append([pb, pc, cs])
    categories = {c: f"cat{c}" for c in range(n_cats)}
    return predictions, targets, categories


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("thresholds", [[0.5], [0.5, 0.75, 0.9]])
def test_mAP_matches_reference(seed, thresholds):
    predictions, targets, categories = _random_case(seed)
    ref_fn = _ref_mAP()
    with contextlib.redirect_stdout(io.StringIO()):
        expected = ref_fn([list(p) for p in predictions],
                          [list(t) for t in targets], categories,
                          thresholds=list(thresholds))
        got = mAP([list(p) for p in predictions], [list(t) for t in targets],
                  categories, thresholds=list(thresholds))
    np.testing.assert_allclose(got, expected, atol=1e-9,
                               err_msg=f"seed {seed} thr {thresholds}")
