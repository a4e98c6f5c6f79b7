"""Batched sentence-encoder driver.

This is the TPU replacement for the reference's per-chunk, batch-size-1 ONNX
path (embeddings.rs:26-58, lance_indexer.rs:59-73):

- the model is loaded ONCE per process (the reference rebuilds the ONNX
  session per index batch and per query);
- chunks are tokenized on host and embedded in fixed-shape (batch, max_len)
  bf16 batches under ``jax.jit`` — one compiled executable serves all sizes
  via padding+masking;
- with a multi-device mesh, the batch axis is sharded over the ``data`` axis
  (pjit-style data parallelism): XLA partitions the same jitted function, no
  collectives needed until pooling output gather.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sema_tpu.models import bert
from sema_tpu.models.loader import load_params
from sema_tpu.models.registry import EncoderSpec, get_spec
from sema_tpu.tokenizer import load_tokenizer

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}


class Encoder:
    """Owns spec + params + tokenizer + the compiled embed function."""

    def __init__(self, spec: EncoderSpec, params, tokenizer,
                 max_length: Optional[int] = None, batch_size: int = 256,
                 compute_dtype=jnp.bfloat16,
                 mesh: Optional[Mesh] = None, data_axis: str = "data",
                 model_axis: Optional[str] = None):
        self.spec = spec
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length or spec.default_max_length
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis

        fn = partial(bert.embed, spec=spec, compute_dtype=compute_dtype)
        if mesh is not None:
            data_sharding = NamedSharding(mesh, P(data_axis, None))
            if model_axis is not None:
                # tensor parallelism (Megatron layout via GSPMD) composed
                # with batch data parallelism (models/tp.py)
                from sema_tpu.models.tp import shard_params_tp
                self.params = shard_params_tp(self.params, mesh, model_axis)
                self._embed = jax.jit(fn, out_shardings=data_sharding)
            else:
                replicated = NamedSharding(mesh, P())
                self._embed = jax.jit(
                    fn,
                    in_shardings=(replicated, data_sharding, data_sharding),
                    out_shardings=data_sharding)
                self.params = jax.device_put(self.params, replicated)
            self._dp = mesh.shape[data_axis]
        else:
            self._embed = jax.jit(fn)
            self._dp = 1
        if self.batch_size % self._dp:
            self.batch_size += self._dp - self.batch_size % self._dp

    # -- construction --------------------------------------------------------

    @classmethod
    def from_config(cls, model_cfg, mesh: Optional[Mesh] = None,
                    data_axis: str = "data") -> "Encoder":
        """Build from a :class:`sema_tpu.config.ModelConfig`."""
        spec = get_spec(model_cfg.name)
        dtype = _DTYPES[model_cfg.dtype]
        params, wsource = load_params(spec, model_cfg.weights_path)
        tok, tsource = load_tokenizer(
            spec.vocab_size, spec.hf_repo,
            path=model_cfg.weights_path)
        enc = cls(spec, params, tok, max_length=model_cfg.max_length,
                  batch_size=model_cfg.batch_size, compute_dtype=dtype,
                  mesh=mesh, data_axis=data_axis)
        enc.weights_source = wsource
        enc.tokenizer_source = tsource
        return enc

    # -- tokenization --------------------------------------------------------

    def tokenize_batch(self, texts: Sequence[str],
                       pad_to: Optional[int] = None
                       ) -> Tuple[np.ndarray, np.ndarray]:
        """Fixed-shape (n_padded, max_length) int32 ids + mask.

        Rows beyond ``len(texts)`` (when padding to a batch multiple) are
        all-PAD with zero mask; their pooled output is a zero vector and is
        dropped by the caller.
        """
        n = len(texts)
        rows = pad_to if pad_to is not None else n
        L = self.max_length
        ids = np.full((rows, L), self.tokenizer.pad_id, dtype=np.int32)
        mask = np.zeros((rows, L), dtype=np.int32)
        encs = (self.tokenizer.encode_batch(list(texts), L)
                if hasattr(self.tokenizer, "encode_batch")
                else [self.tokenizer.encode(t, L) for t in texts])
        for i, (tok_ids, tok_mask) in enumerate(encs):
            k = len(tok_ids)
            ids[i, :k] = tok_ids
            mask[i, :k] = tok_mask
        return ids, mask

    # -- embedding -----------------------------------------------------------

    def embed_ids(self, ids: jax.Array, mask: jax.Array) -> jax.Array:
        """(batch, dim) f32 L2-normalized embeddings for pre-tokenized input."""
        return self._embed(self.params, ids, mask)

    def encode_texts(self, texts: Sequence[str],
                     progress=None) -> np.ndarray:
        """Embed any number of texts; returns (len(texts), dim) f32.

        Streams fixed-shape batches through the single compiled executable.
        ``progress(done, total)`` is called after each device batch (feeds
        the TUI spinner / metrics).
        """
        n = len(texts)
        if n == 0:
            return np.zeros((0, self.spec.dim), dtype=np.float32)
        B = self.batch_size
        out = np.empty((n, self.spec.dim), dtype=np.float32)

        # software pipeline: jax dispatch is async, so tokenizing batch i+1
        # on the host overlaps with the device computing batch i; only the
        # final np.asarray fetch blocks. Keeps the MXU fed from a single
        # host thread (SURVEY.md §7: host↔device streaming hard part).
        pending = None  # (device_embeddings, offset, batch_len)

        def drain(p):
            emb, off_, len_ = p
            out[off_:off_ + len_] = np.asarray(emb)[:len_]
            if progress is not None:
                progress(min(off_ + len_, n), n)

        for off in range(0, n, B):
            batch = list(texts[off:off + B])
            ids, mask = self.tokenize_batch(batch, pad_to=B)
            emb = self.embed_ids(jnp.asarray(ids), jnp.asarray(mask))
            if pending is not None:
                drain(pending)
            pending = (emb, off, len(batch))
        drain(pending)
        return out

    def encode_query(self, text: str) -> np.ndarray:
        """Single-query embedding, (dim,) f32.

        Uses a batch of 1 padded to the data-parallel multiple; latency is
        one encoder forward (the reference reloads the whole model here,
        lance_indexer.rs:114-118).
        """
        rows = max(self._dp, 1)
        ids, mask = self.tokenize_batch([text], pad_to=rows)
        emb = self.embed_ids(jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(emb)[0]
