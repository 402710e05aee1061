"""Production serving: continuous-batching generation over the KV-cached
transformer decode path (slot-scheduled, iteration-level batching; dense
per-slot caches, or paged-KV block pools via PagedServingEngine)."""

from neuralnetworklibrary_tpu.serving.engine import Request, ServingEngine
from neuralnetworklibrary_tpu.serving.paged import PagedServingEngine

__all__ = ["Request", "ServingEngine", "PagedServingEngine"]
