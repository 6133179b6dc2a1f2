"""Multi-chip / multi-host scaling: sharded gene-mer count tables merged with
XLA collectives over a jax.sharding.Mesh."""
