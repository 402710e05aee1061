"""Inference export: freeze a trained Learner into a serving function.

The reference has no deployment story (notebooks are its only entry point).
For production serving on TPU the natural artifact is an AOT-compiled XLA
executable over frozen params: no python model code, no retracing, stable
latency.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def make_inference_fn(learner, postprocess: Optional[str] = "auto"):
    """A pure ``fn(*xs) -> outputs`` closure over the learner's frozen
    params/stats, in eval mode.

    postprocess: 'auto' applies the target-type output correction the
    reference's predict applies (softmax for single-label, sigmoid for
    multi-label; Learner.py:286-393); None returns raw model outputs.
    """
    model = learner.model
    variables = jax.device_get({"params": learner.params, **learner.state})
    kwargs = learner._model_kwargs(train=False)
    tt = learner.target_type if postprocess == "auto" else None

    def fn(*xs):
        if learner.input_pipeline is not None:
            xs = learner.input_pipeline(None, xs, False)
        y = model.apply(variables, *xs, **kwargs)
        if isinstance(y, tuple) and tt not in (None, "bbox"):
            y = y[0]
        if tt in ("cat", "single_label", "text_classify"):
            return jax.nn.softmax(y, axis=-1)
        if tt == "multi_label":
            return jax.nn.sigmoid(y)
        return y

    return fn


def compile_inference(learner, example_inputs, postprocess: Optional[str] = "auto"):
    """AOT-compile the inference function for the example input shapes.

    Returns the compiled executable: calling it never retraces; use
    ``.cost_analysis()`` / ``.memory_analysis()`` for serving capacity
    planning.
    """
    fn = make_inference_fn(learner, postprocess)
    xs = tuple(jnp.asarray(x) for x in (
        example_inputs if isinstance(example_inputs, (tuple, list))
        else (example_inputs,)))
    return jax.jit(fn).lower(*xs).compile()
