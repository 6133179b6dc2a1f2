"""Device-side (JAX/Pallas) kernels for the amira-tpu engine."""
