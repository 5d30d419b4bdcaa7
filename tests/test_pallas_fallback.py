"""Pallas flags must never hard-crash on a libtpu build that rejects the
kernel: each call site compile-probes once and downgrades to its XLA
equivalent (VERDICT r3 item 4; the observed failure mode is a Mosaic 500
from the remote compile helper on rotated libtpu builds)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mask3d_tpu.utils import probe


@pytest.fixture(autouse=True)
def _fresh_probe_cache():
    probe.reset_cache()
    yield
    probe.reset_cache()


def test_probe_caches_failure_and_success():
    calls = {"bad": 0, "good": 0}

    def bad():
        calls["bad"] += 1
        raise RuntimeError("HTTP 500: tpu_compile_helper exit code 1")

    def good():
        calls["good"] += 1

    assert probe.compiles("bad", bad) is False
    assert probe.compiles("bad", bad) is False  # cached, not re-run
    assert calls["bad"] == 1
    assert probe.compiles("good", good) is True
    assert probe.compiles("good", good) is True
    assert calls["good"] == 1


def test_attention_pallas_tile_falls_back_when_probe_fails(monkeypatch):
    """With the kernel probe failing, `pallas_tile>0` must produce the
    chunked-XLA result instead of calling the Pallas kernel."""
    from mask3d_tpu.models import mask3d as m3d
    from mask3d_tpu.ops import pallas_attention as pa

    monkeypatch.setattr(pa, "pallas_attention_available",
                        lambda *a, **k: False)

    def boom(*a, **k):
        raise AssertionError("pallas kernel must not be called")

    monkeypatch.setattr(pa, "masked_cross_attention", boom)

    rng = np.random.default_rng(0)
    B, Q, S, D, H = 2, 8, 1024, 32, 4
    q = jnp.asarray(rng.normal(size=(B, Q, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, Q, S)) < 0.3)

    mha = m3d.MultiheadAttention(d_model=D, num_heads=H)
    params = mha.init(jax.random.PRNGKey(0), q, k, v, mask)
    ref = mha.apply(params, q, k, v, mask, pallas_tile=0)
    got = mha.apply(params, q, k, v, mask, pallas_tile=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_conv_gather_select_downgrades(monkeypatch):
    from mask3d_tpu.sparse import pallas_conv

    # Pretend we are on a TPU whose build rejects the gather variant.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(probe, "compiles", lambda key, build: False)
    assert pallas_conv.resolve_select("gather") == "onehot"
    # onehot needs no probe and passes through untouched.
    assert pallas_conv.resolve_select("onehot") == "onehot"


def test_pallas_conv_gather_select_kept_when_probe_passes(monkeypatch):
    from mask3d_tpu.sparse import pallas_conv

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(probe, "compiles", lambda key, build: True)
    assert pallas_conv.resolve_select("gather") == "gather"
