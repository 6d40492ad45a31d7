"""Pallas TPU kernels — placeholder, intentionally empty in round 1.

A hand-written Mosaic/Pallas traversal kernel was the original plan for
the hot path, but Pallas on TPU cannot express per-lane dynamic table
indexing as of jax 0.9 ("Cannot do int indexing on TPU"; jnp.take supports
only the in-register 2-D gather), and BVH traversal is nothing but
data-dependent table lookups.  The traversal engines therefore live in
pure XLA (ops.traverse_wide / ops.traverse_packet), shaped around the
measured fast paths documented in docs/ARCHITECTURE.md.  Revisit when
Mosaic grows a vector gather primitive.
"""
