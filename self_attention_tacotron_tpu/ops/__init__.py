"""TPU compute-path ops: on-device AR decode loop, fused/Pallas kernels."""
