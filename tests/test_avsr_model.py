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


@pytest.fixture(scope="module")
def tiny_avsr():
    """One tiny AVSR system + init shared module-wide: the init and the
    compiled generate programs (cached per decode config on the system) are
    the dominant cost of every test here."""
    cfg = AVSRConfig.tiny()
    system = AVSRSystem(cfg)
    batch = make_batch(np.random.default_rng(0), cfg)
    variables = system.init(jax.random.PRNGKey(0), batch)
    return cfg, system, variables, batch


def test_avsr_forward_and_generate(tiny_avsr):
    cfg, system, variables, batch = tiny_avsr
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


def test_avsr_generate_with_constraints(tiny_avsr):
    """Product surface of lexically-constrained decoding: forced phrases must
    appear in the best hypothesis (fairseq-cli --constraints; plumbing
    AVSRSystem.generate -> generate_beam -> constrained_beam_search)."""
    cfg, system, variables, batch = tiny_avsr
    # row 0: one 2-token phrase; row 1: unconstrained
    constraints = [[[17, 23]], []]
    seqs, _ = system.generate(
        variables, batch, num_beams=4, max_new_tokens=6,
        cache_dtype=jnp.float32, constraints=constraints,
    )
    best = [r.tolist() for r in np.asarray(seqs[:, 0])]
    assert any(
        best[0][i : i + 2] == [17, 23] for i in range(len(best[0]) - 1)
    ), best[0]
    # ordered mode retraces with its own program (SequenceArrays)
    seqs_o, _ = system.generate(
        variables, batch, num_beams=4, max_new_tokens=6,
        cache_dtype=jnp.float32, constraints=[[[31], [12]], []],
        constraints_mode="ordered",
    )
    row = np.asarray(seqs_o[0, 0]).tolist()
    i31 = row.index(31) if 31 in row else -1
    assert i31 >= 0 and 12 in row[i31 + 1 :], row


@pytest.mark.slow
def test_avsr_grads_flow_only_to_trainable(tiny_avsr):
    """Frozen encoders (whisper/avhubert/sr) get zero grads via stop_gradient."""
    cfg, system, variables, batch = tiny_avsr
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
def test_generate_long_form_chunks(tiny_avsr):
    """Long clip -> per-chunk decodes; chunk count tracks per-sample length."""
    cfg, system, variables, batch = tiny_avsr

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


@pytest.mark.slow  # three extra tiny decode programs
def test_generate_long_form_ground_truth(tiny_avsr):
    """Stitching correctness with a KNOWN answer: periodic inputs make every
    chunk window bit-identical, so each chunk must decode to the same tokens
    as a direct single-window generate() — any error in the video/audio
    window offsets (video stride vs the 4x mel stride) breaks the equality.
    The overlapped variant is the deliberate chunk-boundary repeat case: the
    whisper-style merge must deduplicate the full repeat."""
    from multimodalvc_tpu.models.avsr import merge_token_rows

    cfg, system, variables, batch = tiny_avsr
    t = cfg.max_video_frames  # 16
    b = 2
    rng2 = np.random.default_rng(7)
    v_period = rng2.standard_normal((b, t, 24, 24, 1)).astype(np.float32)
    a_period = rng2.standard_normal((b, cfg.whisper.n_mels, 4 * t)).astype(np.float32)
    long_batch = {
        "video": jnp.asarray(np.tile(v_period, (1, 2, 1, 1, 1))),
        "video_lengths": jnp.asarray([2 * t] * b, jnp.int32),
        "audio_feats": jnp.asarray(np.tile(a_period, (1, 1, 3))),
        "instruction": batch["instruction"],
    }
    gen_kw = dict(num_beams=2, max_new_tokens=4, cache_dtype=jnp.float32)

    # ground truth: ONE window decoded directly
    direct_batch = {
        "video": jnp.asarray(v_period),
        "video_lengths": jnp.asarray([t] * b, jnp.int32),
        "audio_feats": long_batch["audio_feats"][..., : 2 * cfg.whisper.max_frames],
        "instruction": batch["instruction"],
    }
    seqs, _ = system.generate(variables, direct_batch, **gen_kw)
    want = np.asarray(seqs[:, 0])

    texts = system.generate_long_form(
        variables, long_batch, chunk_frames=t, merge=False, **gen_kw
    )
    for i in range(b):
        assert len(texts[i]) == 2
        np.testing.assert_array_equal(texts[i][0], want[i])  # window extraction
        np.testing.assert_array_equal(texts[i][1], want[i])  # offset slicing
    # non-overlapping merge concatenates the two (identical) transcripts
    merged = system.generate_long_form(
        variables, long_batch, chunk_frames=t, **gen_kw
    )
    for i in range(b):
        one = merge_token_rows([want[i]], cfg.eos_token_id, cfg.pad_token_id)
        np.testing.assert_array_equal(merged[i], np.concatenate([one, one]))

    # deliberate boundary repeat: stride-periodic input + overlap -> every
    # window identical -> dedup must collapse the repeats to ONE transcript
    stride = t // 2
    v8 = v_period[:, :stride]
    a8 = a_period[..., : 4 * stride]
    rep_batch = {
        "video": jnp.asarray(np.tile(v8, (1, 4, 1, 1, 1))),
        "video_lengths": jnp.asarray([2 * t] * b, jnp.int32),
        "audio_feats": jnp.asarray(np.tile(a8, (1, 1, 6))),
        "instruction": batch["instruction"],
    }
    merged_rep = system.generate_long_form(
        variables, rep_batch, chunk_frames=t, overlap_frames=t - stride, **gen_kw
    )
    raw_rep = system.generate_long_form(
        variables, rep_batch, chunk_frames=t, overlap_frames=t - stride,
        merge=False, **gen_kw,
    )
    for i in range(b):
        assert len(raw_rep[i]) == 3
        for row in raw_rep[i][1:]:
            np.testing.assert_array_equal(row, raw_rep[i][0])
        one = merge_token_rows(
            [raw_rep[i][0]], cfg.eos_token_id, cfg.pad_token_id
        )
        np.testing.assert_array_equal(merged_rep[i], one)


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
def test_generate_encoder_microbatch_matches_full(tiny_avsr):
    """encoder_microbatch chunks the encoders through lax.map; tokens must
    equal the unchunked program (the decode runs at full batch either way)."""
    cfg, system, variables, batch = tiny_avsr
    batch = {k: v for k, v in batch.items() if k not in ("labels", "label_lengths")}
    kw = dict(num_beams=2, max_new_tokens=4)
    s1, sc1 = system.generate(variables, batch, **kw)
    s2, sc2 = system.generate(variables, batch, encoder_microbatch=2, **kw)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc2), rtol=1e-5, atol=1e-6)
