"""The render pipeline, backend-generic.

Every stage of the device pipeline is implemented here exactly once, in
functions parameterized over the array module `xp` (numpy or jax.numpy).
Run under numpy they form the oracle (the analog of the reference's
shaders/cpu); run under jax.numpy inside `jax.jit` they form the actual
TPU pipeline. Irregular GPU constructs from the reference map as
follows:

  reference (WGSL)                     this pipeline
  -----------------------------------  --------------------------------
  workgroup scans + multi-level trees  dense cumsum over the stream
  atomic bump allocation               count -> exclusive scan ->
                                       searchsorted expansion
  atomic min/max bbox accumulation     segment reductions / scatter
  indirect dispatch                    static capacity + masking
  per-bin serialization (coarse)       stable sort by (tile, draw)
  bump overflow flags                  capacity overflow flags
"""
