"""Production serving: continuous-batching generation over the KV-cached
transformer decode path (slot-scheduled, iteration-level batching)."""

from neuralnetworklibrary_tpu.serving.engine import Request, ServingEngine

__all__ = ["Request", "ServingEngine"]
