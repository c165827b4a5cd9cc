"""Serving tier: AOT predictor padding/chunking + StableHLO export
roundtrip (surya_tpu/infer/serve.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from surya_tpu.core.config import ModelConfig
from surya_tpu.infer.serve import (
    Predictor,
    export_model,
    load_exported,
)
from surya_tpu.models import get_model


@pytest.fixture(scope="module")
def quadtree_setup():
    cfg = ModelConfig(name="quadtree", num_classes=5,
                      compute_dtype="float32")
    model = get_model(cfg)
    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 224, 224, 3)).astype(np.float32)
    feats = rng.normal(size=(3, 47)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.asarray(images), jnp.asarray(feats),
                           train=False)
    logits = model.apply(variables, jnp.asarray(images),
                         jnp.asarray(feats), train=False)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return cfg, variables, images, feats, np.asarray(probs)


def test_predictor_pads_partial_batch(quadtree_setup):
    cfg, variables, images, feats, want_probs = quadtree_setup
    pred = Predictor(cfg, variables, batch_size=4)  # 3 samples → 1 padded chunk
    preds, probs = pred.predict(images, feats)
    assert preds.shape == (3,) and probs.shape == (3, 5)
    np.testing.assert_allclose(probs, want_probs, atol=1e-5)
    np.testing.assert_array_equal(preds, want_probs.argmax(-1))


def test_predictor_chunks_large_requests(quadtree_setup):
    cfg, variables, images, feats, want_probs = quadtree_setup
    pred = Predictor(cfg, variables, batch_size=2)  # 3 samples → 2 chunks
    preds, probs = pred.predict(images, feats)
    np.testing.assert_allclose(probs, want_probs, atol=1e-5)
    cost = pred.cost_analysis()
    assert isinstance(cost, dict)
    empty_p, empty_probs = pred.predict(images[:0], feats[:0])
    assert empty_p.shape == (0,) and empty_probs.shape == (0, 5)


def test_export_roundtrip(quadtree_setup, tmp_path):
    cfg, variables, images, feats, want_probs = quadtree_setup
    path = str(tmp_path / "quadtree.stablehlo")
    export_model(cfg, variables, path, batch_size=3)
    loaded = load_exported(path)
    preds, probs = loaded.call(jnp.asarray(images), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(probs), want_probs, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(preds),
                                  want_probs.argmax(-1))


def test_predictor_on_mesh_matches_single_device(quadtree_setup, mesh8):
    """Multi-chip serving: batch sharded over 'data', params placed by
    the TP rules — same predictions as the single-device predictor."""
    cfg, variables, images, feats, want_probs = quadtree_setup
    pred = Predictor(cfg, variables, batch_size=8, mesh=mesh8)
    preds, probs = pred.predict(images, feats)
    np.testing.assert_allclose(probs, want_probs, atol=1e-5)
    np.testing.assert_array_equal(preds, want_probs.argmax(-1))
    with pytest.raises(ValueError, match="not divisible"):
        Predictor(cfg, variables, batch_size=3, mesh=mesh8)


def test_predictor_uint8_wire_format(quadtree_setup, tmp_path):
    """input_dtype=uint8 accepts raw 0-255 pixels and traces the /255
    into the compiled program — identical probabilities to sending the
    pre-normalized f32 pixels (u8→f32/255 on device == host /255)."""
    cfg, variables, _, feats, _ = quadtree_setup
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=(3, 224, 224, 3), dtype=np.uint8)
    norm = raw.astype(np.float32) / 255.0

    pred_f32 = Predictor(cfg, variables, batch_size=4)
    preds_f, probs_f = pred_f32.predict(norm, feats)
    pred_u8 = Predictor(cfg, variables, batch_size=4,
                        input_dtype=jnp.uint8)
    preds_u, probs_u = pred_u8.predict(raw, feats)
    np.testing.assert_allclose(probs_u, probs_f, atol=1e-5)
    np.testing.assert_array_equal(preds_u, preds_f)

    path = str(tmp_path / "quadtree_u8.stablehlo")
    export_model(cfg, variables, path, batch_size=3,
                 input_dtype=jnp.uint8)
    loaded = load_exported(path)
    preds_e, probs_e = loaded.call(jnp.asarray(raw), jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(probs_e), probs_f, atol=1e-5)


def test_predict_rejects_wire_dtype_mismatch(quadtree_setup):
    """A float wire must reject raw uint8 pixels (they'd be fed ~255×
    out of scale) and a uint8 wire must reject floats (they'd truncate
    to 0) — both produced confidently wrong predictions before."""
    cfg, variables, images, feats, _ = quadtree_setup
    raw = (np.clip(images, 0, 1) * 255).astype(np.uint8)

    pred_f32 = Predictor(cfg, variables, batch_size=4)
    with pytest.raises(ValueError, match="integer dtype"):
        pred_f32.predict(raw, feats)

    pred_u8 = Predictor(cfg, variables, batch_size=4,
                        input_dtype=jnp.uint8)
    with pytest.raises(ValueError, match="wire format is uint8"):
        pred_u8.predict(images, feats)


def test_predictor_temporal_model():
    """Sequence-input serving: a temporal checkpoint (ji_3dcnn) runs
    through the same Predictor path — (N,T,H,W,3)+(N,T,F) inputs,
    chunking/padding, uint8 wire (VERDICT r3 item 8)."""
    cfg = ModelConfig(name="ji_3dcnn", num_classes=5, seq_len=4,
                      compute_dtype="float32")
    model = get_model(cfg)
    rng = np.random.default_rng(2)
    images = rng.random((3, 4, 32, 32, 3)).astype(np.float32)
    feats = rng.normal(size=(3, 4, 47)).astype(np.float32)
    variables = model.init({"params": jax.random.key(0)},
                           jnp.asarray(images), jnp.asarray(feats),
                           train=False)
    want = np.asarray(jax.nn.softmax(model.apply(
        variables, jnp.asarray(images), jnp.asarray(feats),
        train=False).astype(jnp.float32), axis=-1))

    pred = Predictor(cfg, variables, batch_size=2, image_size=32)
    preds, probs = pred.predict(images, feats)  # 3 → chunk + padded tail
    assert preds.shape == (3,) and probs.shape == (3, 5)
    np.testing.assert_allclose(probs, want, atol=1e-5)

    raw = (images * 255).astype(np.uint8)
    pred_u8 = Predictor(cfg, variables, batch_size=4, image_size=32,
                        input_dtype=jnp.uint8)
    preds_u, _ = pred_u8.predict(raw, feats)
    assert preds_u.shape == (3,)


def test_predictor_bf16_params(quadtree_setup):
    """param_dtype=bfloat16 casts weights but not BN statistics; the
    class probabilities stay close to the f32 reference."""
    cfg, variables, images, feats, want_probs = quadtree_setup
    pred = Predictor(cfg, variables, batch_size=4,
                     param_dtype=jnp.bfloat16)
    _, probs = pred.predict(images, feats)
    np.testing.assert_allclose(probs, want_probs, atol=0.05)
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(pred._variables["batch_stats"]))
    assert any(x.dtype == jnp.bfloat16
               for x in jax.tree.leaves(pred._variables["params"]))
