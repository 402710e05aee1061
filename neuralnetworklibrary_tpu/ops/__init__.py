"""Device-side compute ops: batched image augmentation, sampling, kernels."""
