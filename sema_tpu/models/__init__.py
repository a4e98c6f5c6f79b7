"""TPU-side sentence encoders.

Replaces the reference's CPU ONNX inference (src/semantic/embeddings.rs) with
a native JAX BERT-family implementation: batched, jit-compiled, bf16 on the
MXU, data-parallel over a device mesh. The model is loaded once per process
(the reference reloads the ONNX session per index batch and per query,
lance_indexer.rs:61,115).
"""

from sema_tpu.models.registry import ENCODERS, EncoderSpec, get_spec
from sema_tpu.models.encoder import Encoder

__all__ = ["ENCODERS", "EncoderSpec", "get_spec", "Encoder"]
