import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.models.avhubert_pretrain import (
    AVHubertPretrainConfig,
    AVHubertPretrainModel,
)
from multimodalvc_tpu.nn.avhubert import AVHubertConfig
from multimodalvc_tpu.ops.masking import compute_span_mask


def test_span_mask_statistics(rng):
    lengths = jnp.asarray([100, 50, 100, 100])
    mask = compute_span_mask(
        jax.random.PRNGKey(0), 4, 100, lengths, mask_prob=0.8, mask_length=10
    )
    m = np.asarray(mask)
    # only valid positions masked
    assert not m[1, 50:].any()
    # roughly mask_prob coverage (wide tolerance; spans overlap)
    frac = m[0].mean()
    assert 0.25 < frac < 0.95
    # spans are contiguous runs of >= 1
    assert m.dtype == bool


@pytest.mark.slow
def test_pretrain_forward_and_loss(rng):
    cfg = AVHubertPretrainConfig(
        encoder=AVHubertConfig.tiny(), num_classes=32, final_dim=16
    )
    model = AVHubertPretrainModel(cfg)
    b, t = 2, 12
    audio = jnp.asarray(rng.standard_normal((b, t, 104)).astype(np.float32))
    video = jnp.asarray(rng.standard_normal((b, t, 24, 24, 1)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 32, (b, t)))
    lengths = jnp.asarray([12, 8])
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        audio, video, targets, lengths, train=True,
    )
    out, _ = model.apply(
        vs, audio, video, targets, lengths, train=True,
        rngs={"mask": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert np.isfinite(float(out["loss_masked"]))
    assert int(out["n_masked"]) > 0
    assert 0.0 <= float(out["acc_masked"]) <= 1.0
    # masked loss differentiable wrt label embeddings and encoder
    def loss(p):
        o, _ = model.apply(
            {"params": p, **{k: v for k, v in vs.items() if k != "params"}},
            audio, video, targets, lengths, train=True,
            rngs={"mask": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
        )
        return o["loss_masked"]

    g = jax.grad(loss)(vs["params"])
    assert float(jnp.abs(g["label_embs_concat"]).sum()) > 0
    assert float(jnp.abs(g["mask_emb"]).sum()) > 0
