"""sema_tpu — TPU-native semantic + keyword search over local files.

A ground-up re-design of the capabilities of akshitsinha/sema (Rust, CPU/ONNX)
for TPU hardware:

- host side (Python + C++ native extension): crawl, chunk, hash, tokenize,
  BM25 text index, config, CLI, TUI;
- device side (jax/XLA/pallas): batched Flax sentence-encoder forward,
  device-resident sharded embedding store, exact top-k scan kernels with
  on-chip fused top-k reduction and all-gather merge across a
  ``jax.sharding.Mesh``.

Reference behavior parity is documented per-module with file:line citations
into the reference tree (``/root/reference/src``).
"""

__version__ = "0.1.0"
