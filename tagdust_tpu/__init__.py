"""tagdust_tpu — a TPU-native read-classification / demultiplexing framework.

A ground-up rebuild of the capabilities of TagDust2 (Lassmann, BMC
Bioinformatics 16:24, 2015; reference tree mounted at /root/reference) designed
for TPU hardware:

* the user-facing *read architecture* DSL (``-1 B:AC,GG -2 R:N`` ...) compiles
  into dense profile-HMM parameter tensors (`tagdust_tpu.model`),
* the per-read forward/backward + max-posterior labeling dynamic program runs
  batched on TPU via JAX/XLA and Pallas kernels (`tagdust_tpu.engine`),
* a bit-exact deterministic engine (`tagdust_tpu.engine.exact`) reproduces the
  reference's ``-DRTEST`` float32 lookup-table arithmetic for golden
  regression tests,
* host-side IO streams FASTQ/FASTA/SAM batches into device buffers and writes
  demultiplexed per-barcode files with the reference's exact naming and header
  conventions (`tagdust_tpu.io`),
* scale-out happens through `jax.sharding` data-parallel meshes with `psum`
  reductions for counters and posteriors (`tagdust_tpu.parallel`).
"""

__version__ = "0.1.0"
