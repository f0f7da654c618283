"""Device compute kernels (jit/Pallas) for the processing pipeline."""
