"""Production serving: continuous-batching generation over the KV-cached
transformer decode path (slot-scheduled, iteration-level batching; dense
per-slot caches, paged-KV block pools via PagedServingEngine, or
draft-accelerated greedy decode via SpeculativeServingEngine)."""

from neuralnetworklibrary_tpu.serving.engine import Request, ServingEngine
from neuralnetworklibrary_tpu.serving.paged import PagedServingEngine
from neuralnetworklibrary_tpu.serving.speculative import (
    PagedSpeculativeServingEngine,
    SpeculativeServingEngine,
)

__all__ = ["Request", "ServingEngine", "PagedServingEngine",
           "SpeculativeServingEngine", "PagedSpeculativeServingEngine"]
