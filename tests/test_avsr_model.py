import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.models.avsr import (
    IGNORE_INDEX,
    AVSRConfig,
    AVSRSystem,
    assemble_left_padded,
)


def make_batch(rng, cfg, b=2):
    t_v = cfg.max_video_frames
    n_frames = 2 * cfg.whisper.max_frames
    vid_lens = [t_v if i % 2 == 0 else t_v // 2 for i in range(b)]
    lab_lens = [8 if i % 2 == 0 else 4 for i in range(b)]
    batch = {
        "audio_feats": jnp.asarray(
            rng.standard_normal((b, cfg.whisper.n_mels, n_frames)).astype(np.float32)
        ),
        "video": jnp.asarray(rng.standard_normal((b, t_v, 24, 24, 1)).astype(np.float32)),
        "video_lengths": jnp.asarray(vid_lens, dtype=jnp.int32),
        "instruction": jnp.asarray(rng.integers(1, 200, (b, 5))),
        "labels": jnp.asarray(rng.integers(1, 200, (b, 8))),
        "label_lengths": jnp.asarray(lab_lens, dtype=jnp.int32),
    }
    return batch


def test_assemble_left_padded(rng):
    d = 4
    pad = jnp.full((d,), -1.0)
    inst = jnp.asarray(rng.standard_normal((2, 3, d)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((2, 5, d)).astype(np.float32))
    q_lens = jnp.asarray([5, 2])
    lab_emb = jnp.asarray(rng.standard_normal((2, 4, d)).astype(np.float32))
    lab_tok = jnp.asarray([[11, 12, 13, 14], [21, 22, 0, 0]])
    lab_lens = jnp.asarray([4, 2])
    emb, mask, labels = assemble_left_padded(pad, inst, queries, q_lens, lab_emb, lab_tok, lab_lens)
    L = 3 + 5 + 4
    assert emb.shape == (2, L, d)
    # row 0: full content 12 == L -> no padding
    assert mask[0].sum() == 12 and mask[1].sum() == 3 + 2 + 2
    np.testing.assert_allclose(np.asarray(emb[0, :3]), np.asarray(inst[0]))
    np.testing.assert_allclose(np.asarray(emb[0, 3:8]), np.asarray(queries[0]))
    np.testing.assert_allclose(np.asarray(emb[0, 8:]), np.asarray(lab_emb[0]))
    # row 1: pad(5) inst(3) q(2) lab(2)
    np.testing.assert_allclose(np.asarray(emb[1, :5]), np.full((5, d), -1.0))
    np.testing.assert_allclose(np.asarray(emb[1, 5:8]), np.asarray(inst[1]))
    np.testing.assert_allclose(np.asarray(emb[1, 8:10]), np.asarray(queries[1, :2]))
    np.testing.assert_allclose(np.asarray(emb[1, 10:]), np.asarray(lab_emb[1, :2]))
    # labels: IGNORE everywhere except label region
    assert list(np.asarray(labels[0])) == [IGNORE_INDEX] * 8 + [11, 12, 13, 14]
    assert list(np.asarray(labels[1])) == [IGNORE_INDEX] * 10 + [21, 22]


def test_avsr_forward_and_generate(rng):
    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg)
    variables = system.init(jax.random.PRNGKey(0), batch)
    (loss, aux), _ = jax.jit(
        lambda v, b: system.loss_fn(v, b), static_argnums=()
    )(variables, batch), None
    assert np.isfinite(float(loss))
    assert int(aux["n_valid"]) > 0
    # query budget respects the SR-scaled bounds
    q_lens = np.asarray(aux["query_lens"])
    assert (q_lens >= cfg.queries_per_sec).all()
    assert (q_lens <= cfg.max_queries).all()

    seqs, scores = system.generate(variables, batch, num_beams=2, max_new_tokens=4,
                                   cache_dtype=jnp.float32)
    assert seqs.shape == (2, 2, 4)
    assert np.all(np.asarray(scores)[:, 0] >= np.asarray(scores)[:, 1] - 1e-6)


@pytest.mark.slow
def test_avsr_grads_flow_only_to_trainable(rng):
    """Frozen encoders (whisper/avhubert/sr) get zero grads via stop_gradient."""
    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg)
    variables = system.init(jax.random.PRNGKey(0), batch)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_of(p):
        out, _ = system.module.apply({"params": p, **rest}, batch)
        return out

    grads = jax.grad(loss_of)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]

    def total(pred):
        vals = [jnp.abs(v).sum() for kp, v in flat if pred("/".join(str(getattr(k, "key", k)) for k in kp))]
        return float(sum(vals)) if vals else 0.0

    assert total(lambda p: "whisper" in p and "sr_" not in p) == 0.0
    assert total(lambda p: "avhubert" in p) == 0.0
    assert total(lambda p: "qformer" in p) > 0.0
    assert total(lambda p: "avfeat_to_llm" in p) > 0.0
    assert total(lambda p: "lora" in p) > 0.0


@pytest.mark.slow  # long-form variant; fast tier keeps merge_token_rows + generate
def test_generate_long_form_chunks(rng):
    """Long clip -> per-chunk decodes; chunk count tracks per-sample length."""
    import jax

    from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRSystem

    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg)
    variables = system.init(jax.random.PRNGKey(0), batch)

    t_long = 3 * cfg.max_video_frames
    long_batch = {
        "video": jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (2, t_long, 24, 24, 1)
            ).astype(np.float32)
        ),
        "video_lengths": jnp.asarray([t_long, cfg.max_video_frames], jnp.int32),
        "audio_feats": jnp.concatenate([batch["audio_feats"]] * 3, axis=-1),
        "instruction": batch["instruction"],
    }
    texts = system.generate_long_form(
        variables, long_batch, chunk_frames=cfg.max_video_frames,
        num_beams=2, max_new_tokens=4, merge=False,
    )
    assert len(texts) == 2
    assert len(texts[0]) == 3  # full-length sample: 3 chunks
    assert len(texts[1]) == 1  # short sample: only the first chunk valid
    for row in texts[0]:
        assert row.shape == (4,)

    # merged (default): ONE 1-D token row per sample, pad/eos stripped, with
    # the longest suffix/prefix overlap between neighbours deduplicated
    merged = system.generate_long_form(
        variables, long_batch, chunk_frames=cfg.max_video_frames,
        overlap_frames=cfg.max_video_frames // 4, num_beams=2, max_new_tokens=4,
    )
    assert len(merged) == 2
    for row in merged:
        assert row.ndim == 1
        assert cfg.pad_token_id not in row.tolist()
        assert cfg.eos_token_id not in row.tolist()

    # full-clip mels are REQUIRED: a single 30 s window must be rejected
    bad = dict(long_batch)
    bad["audio_feats"] = long_batch["audio_feats"][..., : long_batch["audio_feats"].shape[-1] // 3]
    with pytest.raises(ValueError, match="full-clip"):
        system.generate_long_form(
            variables, bad, chunk_frames=cfg.max_video_frames, num_beams=2, max_new_tokens=4
        )


def test_merge_token_rows():
    from multimodalvc_tpu.models.avsr import merge_token_rows

    eos, pad = 2, 0
    # longest suffix/prefix overlap wins: [7 8 9] + [8 9 4] -> [7 8 9 4]
    rows = [np.asarray([7, 8, 9, eos, pad]), np.asarray([8, 9, 4, eos, pad])]
    np.testing.assert_array_equal(merge_token_rows(rows, eos, pad), [7, 8, 9, 4])
    # no overlap: plain concatenation
    rows = [np.asarray([7, 8]), np.asarray([5, 6])]
    np.testing.assert_array_equal(merge_token_rows(rows, eos, pad), [7, 8, 5, 6])
    # full containment of the repeated window across three chunks
    rows = [
        np.asarray([1, 9, 3, 4]),
        np.asarray([3, 4, 5, 6]),
        np.asarray([5, 6, 7, eos]),
    ]
    np.testing.assert_array_equal(
        merge_token_rows(rows, eos, pad), [1, 9, 3, 4, 5, 6, 7]
    )
    # everything after EOS (garbage lanes) is dropped before merging
    rows = [np.asarray([1, 4, eos, 9, 9]), np.asarray([4, 3, eos, 8])]
    np.testing.assert_array_equal(merge_token_rows(rows, eos, pad), [1, 4, 3])
    assert merge_token_rows([], eos, pad).shape == (0,)


@pytest.mark.slow  # microbatch variant of generate; exercised on TPU by bench.py
def test_generate_encoder_microbatch_matches_full(rng):
    """encoder_microbatch chunks the encoders through lax.map; tokens must
    equal the unchunked program (the decode runs at full batch either way)."""
    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(rng, cfg)
    batch.pop("labels"), batch.pop("label_lengths")
    variables = system.init(jax.random.PRNGKey(0), {**batch,
        "labels": jnp.zeros((2, 4), jnp.int32),
        "label_lengths": jnp.ones((2,), jnp.int32)})
    kw = dict(num_beams=2, max_new_tokens=4)
    s1, sc1 = system.generate(variables, batch, **kw)
    s2, sc2 = system.generate(variables, batch, encoder_microbatch=2, **kw)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), rtol=1e-5, atol=1e-6)
