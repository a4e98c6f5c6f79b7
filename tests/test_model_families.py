"""Every registry spec constructs and runs forward (BASELINE model ladder)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sema_tpu.models import ENCODERS, get_spec
from sema_tpu.models.bert import embed
from sema_tpu.models.loader import random_params


def test_registry_complete():
    # the BASELINE.json config ladder (BASELINE.md)
    assert {"minilm-l6", "bge-small-en", "e5-base", "gte-large"} <= set(ENCODERS)
    assert get_spec("minilm-l6").dim == 384
    assert get_spec("bge-small-en").pooling == "cls"
    assert get_spec("e5-base").dim == 768
    assert get_spec("gte-large").dim == 1024


def test_unknown_spec_raises():
    with pytest.raises(KeyError, match="available"):
        get_spec("nonexistent-model")


@pytest.mark.parametrize("name", ["minilm-l6", "bge-small-en", "e5-base"])
def test_forward_runs_and_normalizes(name):
    """Tiny-sequence smoke forward per family (gte-large excluded: 300M
    random params make the test slow; it shares the exact same code path
    as e5-base, differing only in width/depth)."""
    spec = get_spec(name)
    params = random_params(spec, seed=0)
    ids = jnp.ones((2, 8), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    out = np.asarray(embed(params, ids, mask, spec))
    assert out.shape == (2, spec.dim)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)
