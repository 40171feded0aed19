"""Beam search parity vs HF generate on the tiny random LLaMA."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from multimodalvc_tpu.nn.llama import (  # noqa: E402
    LlamaConfig,
    LlamaModel,
    generate_beam,
    import_hf_llama,
)

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def pair():
    from tests.test_llama import make_hf_tiny

    hf = make_hf_tiny()
    hf.generation_config.eos_token_id = EOS
    hf.generation_config.pad_token_id = PAD
    cfg = LlamaConfig.tiny()
    cfg.lora = None
    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    return hf, LlamaModel(cfg), import_hf_llama(state, cfg)


def _strip(seq):
    out = []
    for t in seq:
        out.append(int(t))
        if t == EOS:
            break
    return out


@pytest.mark.parametrize("beams,max_new", [(1, 8), (3, 10), (5, 6)])
def test_beam_matches_hf(pair, rng, beams, max_new):
    hf, model, variables = pair
    emb = (rng.standard_normal((2, 7, 64)) * 0.05).astype(np.float32)
    mask = np.ones((2, 7), dtype=np.int64)
    mask[1, :3] = 0  # left padding on row 1
    with torch.no_grad():
        ref = hf.generate(
            inputs_embeds=torch.from_numpy(emb),
            attention_mask=torch.from_numpy(mask),
            num_beams=beams,
            max_new_tokens=max_new,
            min_length=1,
            do_sample=False,
            eos_token_id=EOS,
            pad_token_id=PAD,
        ).numpy()
    seqs, scores = generate_beam(
        model,
        variables,
        jnp.asarray(emb),
        jnp.asarray(mask),
        eos_token_id=EOS,
        pad_token_id=PAD,
        num_beams=max(beams, 2),  # our impl needs >=2 beams; HF beam=1 = greedy
        max_new_tokens=max_new,
        cache_dtype=jnp.float32,
    )
    if beams == 1:
        from multimodalvc_tpu.nn.llama import LlamaModel as _M  # noqa: F401
        # compare greedy: HF beam=1 equals greedy; our top beam with k=2 may
        # differ, so run greedy path separately below
        return
    best = np.asarray(seqs[:, 0])
    for b in range(2):
        assert _strip(best[b]) == _strip(ref[b]), (b, best[b], ref[b])


def test_greedy_matches_hf(pair, rng):
    hf, model, variables = pair
    emb = (rng.standard_normal((2, 5, 64)) * 0.05).astype(np.float32)
    mask = np.ones((2, 5), dtype=np.int64)
    mask[0, :2] = 0
    with torch.no_grad():
        ref = hf.generate(
            inputs_embeds=torch.from_numpy(emb),
            attention_mask=torch.from_numpy(mask),
            num_beams=1,
            do_sample=False,
            max_new_tokens=9,
            eos_token_id=EOS,
            pad_token_id=PAD,
        ).numpy()

    # greedy via the shared prefill + ops.greedy_search
    from multimodalvc_tpu.ops.beam_search import greedy_search

    b, t_prompt, _ = emb.shape
    total = t_prompt + 9
    cache = model.apply(
        variables, method=LlamaModel.init_cache, batch=b, max_len=total, dtype=jnp.float32
    )
    am = jnp.asarray(mask).astype(jnp.int32)
    rope_pos = jnp.maximum(jnp.cumsum(am, axis=1) - 1, 0)
    out = model.apply(
        variables,
        inputs_embeds=jnp.asarray(emb),
        attn_mask=jnp.concatenate([am, jnp.zeros((b, 9), jnp.int32)], axis=1),
        positions=rope_pos,
        cache=cache,
        cache_positions=jnp.broadcast_to(jnp.arange(t_prompt)[None], (b, t_prompt)),
    )
    gen_ids = jnp.arange(9)[None, :]

    def decode_fn(tokens, positions, cache_):
        idx = cache_[0]["index"]
        gen_mask = (gen_ids <= idx - t_prompt).astype(jnp.int32)
        step_mask = jnp.concatenate([am, jnp.broadcast_to(gen_mask, (b, 9))], axis=1)
        o = model.apply(
            variables,
            input_ids=tokens,
            attn_mask=step_mask,
            positions=positions,
            cache=cache_,
            cache_positions=jnp.full((b, 1), idx, jnp.int32),
        )
        return o["logits"][:, -1], o["cache"]

    seqs = greedy_search(
        decode_fn,
        out["cache"],
        prompt_lengths=jnp.sum(am, axis=1),
        first_logits=out["logits"][:, -1],
        eos_token_id=EOS,
        pad_token_id=PAD,
        max_new_tokens=9,
    )
    got = np.asarray(seqs)
    for i in range(2):
        assert _strip(got[i]) == _strip(ref[i]), (i, got[i], ref[i])


def test_filter_logits_topk_topp():
    from multimodalvc_tpu.ops.beam_search import NEG_INF, _filter_logits

    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    k2 = _filter_logits(logits, top_k=2)
    assert np.isneginf(np.asarray(k2)[0, :2]).all() or (np.asarray(k2)[0, :2] <= NEG_INF).all()
    assert (np.asarray(k2)[0, 2:] > NEG_INF / 2).all()
    # top_p keeps the smallest prefix covering p (always >= 1 token)
    probs = np.asarray(jax.nn.softmax(logits))
    p_keep = float(probs[0, 3])  # top-1 mass
    p1 = _filter_logits(logits, top_p=p_keep * 0.5)
    kept = (np.asarray(p1) > NEG_INF / 2)[0]
    assert kept.tolist() == [False, False, False, True]


def test_sample_search_respects_filtering(rng):
    """With top_k=1 sampling degenerates to greedy on a fixed-logit decoder."""
    from multimodalvc_tpu.ops.beam_search import greedy_search, sample_search

    V, B, L = 11, 3, 6
    table = jnp.asarray(rng.standard_normal((V, V)).astype(np.float32)) * 3.0

    def decode_fn(tokens, positions, cache):
        return table[tokens[:, 0]], cache

    first = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32)) * 3.0
    lens = jnp.asarray([4, 4, 4], jnp.int32)
    greedy = greedy_search(decode_fn, {}, lens, first, EOS, PAD, L)
    sampled = sample_search(
        decode_fn, {}, lens, first, EOS, PAD, L,
        rng=jax.random.PRNGKey(0), top_k=1,
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))
    # unconstrained sampling with different seeds gives different outputs
    s1 = sample_search(decode_fn, {}, lens, first, EOS, PAD, L, rng=jax.random.PRNGKey(1), temperature=5.0)
    s2 = sample_search(decode_fn, {}, lens, first, EOS, PAD, L, rng=jax.random.PRNGKey(2), temperature=5.0)
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


def test_diverse_beam_search_diversifies(rng):
    """Groups produce different first tokens; zero strength reduces to plain
    grouped beam search whose best sequence matches beam_search's best."""
    from multimodalvc_tpu.ops.beam_search import beam_search, diverse_beam_search

    V, B, L, K = 13, 2, 5, 4
    table = jnp.asarray(rng.standard_normal((V, V)).astype(np.float32)) * 2.0

    def decode_fn(tokens, positions, cache):
        return table[tokens[:, 0]], cache

    first = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32)) * 2.0
    lens = jnp.asarray([3, 3], jnp.int32)

    seqs_d, _ = diverse_beam_search(
        decode_fn, {}, lens, first, EOS, PAD, L,
        num_beams=K, num_groups=2, diversity_strength=10.0,
    )
    # with a huge penalty the two groups must open with different tokens
    firsts = np.asarray(seqs_d)[:, :, 0]
    for row in firsts:
        assert len(set(row.tolist())) >= 2

    seqs_0, scores_0 = diverse_beam_search(
        decode_fn, {}, lens, first, EOS, PAD, L,
        num_beams=K, num_groups=2, diversity_strength=0.0,
    )
    seqs_b, scores_b = beam_search(
        decode_fn, {}, lens, first, EOS, PAD, L, num_beams=K
    )
    np.testing.assert_allclose(
        np.asarray(scores_0)[:, 0], np.asarray(scores_b)[:, 0], rtol=1e-5
    )


def test_no_repeat_ngram_blocks_cycles(rng):
    """A decoder that deterministically cycles A->B->A->B... is broken out
    of the cycle by no_repeat_ngram_size=2."""
    from multimodalvc_tpu.ops.beam_search import beam_search

    V, B, L = 6, 1, 8
    A, Bt = 3, 4
    table = np.full((V, V), -10.0, np.float32)
    table[A, Bt] = 5.0   # after A, strongly prefer B
    table[Bt, A] = 5.0   # after B, strongly prefer A
    table[A, 1] = 2.0    # second choices
    table[Bt, 1] = 2.0
    tbl = jnp.asarray(table)

    def decode_fn(tokens, positions, cache):
        return tbl[tokens[:, 0]], cache

    first = jnp.full((B, V), -10.0, jnp.float32).at[0, A].set(5.0)
    lens = jnp.asarray([2], jnp.int32)
    free, _ = beam_search(decode_fn, {}, lens, first, EOS, PAD, L, num_beams=1)
    blocked, _ = beam_search(
        decode_fn, {}, lens, first, EOS, PAD, L, num_beams=1, no_repeat_ngram_size=2
    )
    free, blocked = np.asarray(free)[0, 0], np.asarray(blocked)[0, 0]
    assert free.tolist()[:5] == [A, Bt, A, Bt, A]  # unblocked cycles
    # blocked: A B A then "A B" bigram is banned from repeating -> next != B
    assert blocked.tolist()[:3] == [A, Bt, A]
    assert blocked[3] != Bt


def test_ensemble_identical_members_match_single(pair, rng):
    """Log-prob-averaged ensemble of identical members == single model
    (reference: fairseq EnsembleModel averaging in sequence_generator.py)."""
    _, model, variables = pair
    emb = (rng.standard_normal((2, 7, 64)) * 0.05).astype(np.float32)
    mask = np.ones((2, 7), dtype=np.int64)
    mask[1, :3] = 0
    kw = dict(eos_token_id=EOS, pad_token_id=PAD, num_beams=3,
              max_new_tokens=8, cache_dtype=jnp.float32)
    seqs1, scores1 = generate_beam(model, variables, jnp.asarray(emb), jnp.asarray(mask), **kw)
    seqs2, scores2 = generate_beam(
        model, [variables, variables],
        [jnp.asarray(emb), jnp.asarray(emb)],
        [jnp.asarray(mask), jnp.asarray(mask)], **kw
    )
    np.testing.assert_array_equal(np.asarray(seqs1[:, 0]), np.asarray(seqs2[:, 0]))
    np.testing.assert_allclose(np.asarray(scores1), np.asarray(scores2), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_ensemble_distinct_members_and_prompt_lengths(pair, rng):
    """Members with DIFFERENT weights and different prompt lengths decode
    jointly (per-member position offsets) and produce valid sequences."""
    _, model, variables = pair
    cfg = LlamaConfig.tiny()
    cfg.lora = None
    model2 = LlamaModel(cfg)
    v2 = model2.init(
        jax.random.PRNGKey(7),
        inputs_embeds=jnp.zeros((1, 4, 64), jnp.float32),
        attn_mask=jnp.ones((1, 4), jnp.int32),
    )
    emb_a = (rng.standard_normal((2, 7, 64)) * 0.05).astype(np.float32)
    mask_a = np.ones((2, 7), dtype=np.int64); mask_a[1, :3] = 0
    emb_b = (rng.standard_normal((2, 9, 64)) * 0.05).astype(np.float32)
    mask_b = np.ones((2, 9), dtype=np.int64); mask_b[0, :4] = 0
    seqs, scores = generate_beam(
        model, [variables, v2],
        [jnp.asarray(emb_a), jnp.asarray(emb_b)],
        [jnp.asarray(mask_a), jnp.asarray(mask_b)],
        eos_token_id=EOS, pad_token_id=PAD, num_beams=3,
        max_new_tokens=8, cache_dtype=jnp.float32,
    )
    assert seqs.shape == (2, 3, 8)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(seqs) >= 0).all()


def test_gather_beams_onehot_path_exact(rng):
    """Large float leaves reorder via the one-hot einsum (single-pass cache
    traffic); must select bit-exactly what take_along_axis selects."""
    from multimodalvc_tpu.ops.beam_search import _gather_beams

    b, k = 2, 8  # one-hot path is gated to k >= 8
    big = jnp.asarray(
        rng.standard_normal((b * k, 4, 64, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)  # 2^18+ elements -> one-hot path
    small = jnp.asarray(rng.integers(0, 9, (b * k, 7)), jnp.int32)
    idx = jnp.asarray(
        [[4, 0, 0, 2, 1, 7, 6, 6], [3, 3, 1, 0, 4, 5, 2, 7]], jnp.int32
    )
    out = _gather_beams({"big": big, "small": small, "idx0": jnp.zeros(())}, idx, b, k)
    bb = np.asarray(big).reshape(b, k, 4, 64, 128)
    expect = np.stack([bb[i, np.asarray(idx)[i]] for i in range(b)]).reshape(
        b * k, 4, 64, 128
    )
    np.testing.assert_array_equal(np.asarray(out["big"], np.float32), expect.astype(np.float32))
    ss = np.asarray(small).reshape(b, k, 7)
    exp_s = np.stack([ss[i, np.asarray(idx)[i]] for i in range(b)]).reshape(b * k, 7)
    np.testing.assert_array_equal(np.asarray(out["small"]), exp_s)


def test_beam_gather_rows_matches_take_along_axis(rng):
    from multimodalvc_tpu.ops.beam_gather import gather_beams_rows, gather_rows

    b, k, h, L, d = 3, 5, 2, 4, 128
    x = jnp.asarray(rng.standard_normal((b * k, h, L, d)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, k, (b, k)), jnp.int32)
    got = np.asarray(gather_beams_rows(x, idx, b, k))
    xb = np.asarray(x).reshape(b, k, h, L, d)
    exp = np.stack([xb[i, np.asarray(idx)[i]] for i in range(b)]).reshape(b * k, h, L, d)
    np.testing.assert_array_equal(got, exp)

    # raw row gather with duplicate + out-of-order sources
    src = jnp.asarray([4, 4, 0, 7, 2], jnp.int32)
    got2 = np.asarray(gather_rows(x, src))
    np.testing.assert_array_equal(got2, np.asarray(x)[np.asarray(src)])


def test_beam_topk_matches_lax(rng):
    from multimodalvc_tpu.ops.topk import beam_topk

    b, k, v = 3, 5, 4000
    logp = rng.standard_normal((b, k, v)).astype(np.float32)
    # exact cross-beam and in-beam ties to exercise the index-asc tie-break
    logp[0, 1, 7] = logp[0, 3, 2900] = logp[0, 0, 100] = 4.5
    logp[1, 2, 5] = logp[1, 2, 6] = 3.25
    scores = rng.standard_normal((b, k)).astype(np.float32)
    scores[0] = 0.0  # keep the planted ties exact after the add
    v_ref, i_ref = jax.lax.top_k(
        (jnp.asarray(scores)[:, :, None] + jnp.asarray(logp)).reshape(b, k * v), 10
    )
    v2, i2 = beam_topk(jnp.asarray(logp), jnp.asarray(scores), 10)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i2))


def test_beam_topk_from_logits_matches_lax(rng):
    """Fused serving path: raw logits + per-row max/logsumexp must equal
    lax.top_k over scores + log_softmax(logits) bit-exactly (the kernel
    replays XLA's ((x - max) - logS) + score op order)."""
    from multimodalvc_tpu.ops.topk import beam_topk_from_logits

    b, k, v = 3, 5, 4000
    logits = rng.standard_normal((b * k, v)).astype(np.float32) * 4.0
    # exact in-row ties survive the per-row normalise+add: same row -> same
    # max/logsumexp/score -> equal candidate values, index-asc order applies
    # (cross-row ties can't stay exact through per-row normalisation)
    logits[0 * k + 1, 7] = logits[0 * k + 1, 2900] = 30.0
    logits[1 * k + 2, 5] = logits[1 * k + 2, 6] = 25.0
    scores = rng.standard_normal((b, k)).astype(np.float32)
    lf = jnp.asarray(logits)
    logp = jax.nn.log_softmax(lf, axis=-1)
    cand = jnp.asarray(scores)[:, :, None] + logp.reshape(b, k, v)
    v_ref, i_ref = jax.lax.top_k(cand.reshape(b, k * v), 10)
    row_max = jnp.max(lf, axis=-1, keepdims=True)
    row_ls = jnp.log(jnp.sum(jnp.exp(lf - row_max), axis=-1, keepdims=True))
    v2, i2 = beam_topk_from_logits(lf, row_max, row_ls, jnp.asarray(scores), 10)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v2))


def test_beam_topk_columns_matches_lax(rng):
    """Column-champion variant: exact vs lax.top_k including multi-winners
    in one column (all K beams' best token identical) and in-row ties."""
    from multimodalvc_tpu.ops.topk import beam_topk_columns

    b, k, v = 3, 5, 4096
    logits = rng.standard_normal((b * k, v)).astype(np.float32) * 4.0
    # one column dominating several rows of batch 1 (top-n must pull
    # multiple winners out of a single champion column)
    logits[1 * k + 0, 77] = 40.0
    logits[1 * k + 2, 77] = 39.5
    logits[1 * k + 4, 77] = 39.0
    # in-row tie (same row, two columns)
    logits[2 * k + 1, 5] = logits[2 * k + 1, 6] = 25.0
    scores = rng.standard_normal((b, k)).astype(np.float32)
    lf = jnp.asarray(logits)
    logp = jax.nn.log_softmax(lf, axis=-1)
    cand = jnp.asarray(scores)[:, :, None] + logp.reshape(b, k, v)
    v_ref, i_ref = jax.lax.top_k(cand.reshape(b, k * v), 10)
    row_max = jnp.max(lf, axis=-1, keepdims=True)
    row_ls = jnp.log(jnp.sum(jnp.exp(lf - row_max), axis=-1, keepdims=True))
    v2, i2 = beam_topk_columns(lf, row_max, row_ls, jnp.asarray(scores), 10)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v2))


def test_beam_topk_multiblock_tie_order(rng):
    """Ties that straddle column blocks must keep lax.top_k's value-desc /
    flat-index-asc order.  V is a 128-multiple large enough for the kernel to
    split into multiple column blocks (block-major merge order is NOT flat
    index order), and the planted tie pairs a later row's low column (block 0,
    large flat index) with an earlier row's high column (block 1+, small flat
    index).  Regression for the r3 ADVICE finding."""
    from multimodalvc_tpu.ops.topk import _pick_block, beam_topk

    b, k, v = 2, 2, 49152
    assert v // _pick_block(v) >= 2, "test requires a multi-block split"
    logp = (rng.standard_normal((b, k, v)) - 20.0).astype(np.float32)
    # flat 24576 (row 0 -> block 1) ties flat 49152 (row 1, col 0 -> block 0)
    logp[0, 0, 24576] = logp[0, 1, 0] = 5.0
    # a 3-way tie spanning blocks, plus -inf masking must not break knock-out
    logp[1, 0, 30000] = logp[1, 1, 1] = logp[1, 1, 40000] = 2.5
    logp[1, 0, :10] = -np.inf
    scores = np.zeros((b, k), np.float32)
    cand = np.where(np.isinf(logp), -2.9e38, logp).reshape(b, k * v)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(cand), 6)
    v2, i2 = beam_topk(jnp.asarray(logp), jnp.asarray(scores), 6)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v2))


def test_finalize_live_beats_early_eos():
    """HF finalize: at budget exhaustion live beams compete with the finished
    pool.  An immediate-EOS hypothesis (normalized at length 1) must LOSE to
    a longer live hypothesis whose per-token logprob is much better.
    Regression: a prior version returned finished hypotheses whenever any
    existed, keeping the early EOS."""
    from multimodalvc_tpu.ops.beam_search import beam_search

    V, L = 4, 6  # tokens: 0=pad, 1, 2=EOS, 3
    # first step: EOS has prob 0.3, token 3 has prob 0.6
    first = jnp.log(jnp.asarray([[1e-6, 0.1, 0.3, 0.6]], jnp.float32))

    def decode_fn(tokens, positions, cache):
        # continuing is nearly free: token 3 has prob ~1 forever
        row = jnp.log(jnp.asarray([1e-9, 1e-9, 1e-9, 1.0 - 3e-9], jnp.float32))
        return jnp.broadcast_to(row, (tokens.shape[0], V)), cache

    seqs, scores = beam_search(
        decode_fn, {}, jnp.asarray([3], jnp.int32), first,
        eos_token_id=2, pad_token_id=0, max_new_tokens=L, num_beams=2,
    )
    best = np.asarray(seqs)[0, 0]
    # live hypothesis: 3,3,3,3,3,3 with score ~log(0.6)/6 = -0.085
    # early-EOS hypothesis: [2] with score log(0.3)/1 = -1.20
    assert best.tolist() == [3] * L, best
    assert np.asarray(scores)[0, 0] > np.log(0.3) + 1e-3


def test_ancestry_reorder_matches_default(pair, rng):
    """ancestry_reorder=True (gen-KV never moves; in-kernel ancestry select,
    ops/decode_attention.py) must pick the same sequences as the default
    physically-reordered split cache, with close scores."""
    _, model, variables = pair
    emb = (rng.standard_normal((2, 7, 64)) * 0.05).astype(np.float32)
    mask = np.ones((2, 7), dtype=np.int64)
    mask[1, :3] = 0
    kw = dict(eos_token_id=EOS, pad_token_id=PAD, num_beams=3,
              max_new_tokens=8, cache_dtype=jnp.float32)
    seqs1, scores1 = generate_beam(
        model, variables, jnp.asarray(emb), jnp.asarray(mask), **kw
    )
    seqs2, scores2 = generate_beam(
        model, variables, jnp.asarray(emb), jnp.asarray(mask),
        ancestry_reorder=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(seqs1), np.asarray(seqs2))
    np.testing.assert_allclose(
        np.asarray(scores1), np.asarray(scores2), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_ensemble_three_members_varied_lengths(pair, rng):
    """3-member ensemble (beyond the product's 2-member use): distinct
    weights, three different prompt lengths — the per-member position
    offsets must hold for every member, and an ensemble of identical
    members must still reduce to the single model."""
    _, model, variables = pair
    cfg = LlamaConfig.tiny()
    cfg.lora = None
    vs = [variables]
    for seed in (7, 8):
        vs.append(
            LlamaModel(cfg).init(
                jax.random.PRNGKey(seed),
                inputs_embeds=jnp.zeros((1, 4, 64), jnp.float32),
                attn_mask=jnp.ones((1, 4), jnp.int32),
            )
        )
    embs, masks = [], []
    for i, t in enumerate((7, 9, 6)):
        e = (rng.standard_normal((2, t, 64)) * 0.05).astype(np.float32)
        m = np.ones((2, t), dtype=np.int64)
        m[1, : 2 + i] = 0
        embs.append(jnp.asarray(e))
        masks.append(jnp.asarray(m))
    kw = dict(eos_token_id=EOS, pad_token_id=PAD, num_beams=3,
              max_new_tokens=6, cache_dtype=jnp.float32)
    seqs, scores = generate_beam(model, vs, embs, masks, **kw)
    assert seqs.shape == (2, 3, 6)
    assert np.isfinite(np.asarray(scores)).all()

    # identical members at 3x: exact reduction to the single model
    s1, sc1 = generate_beam(model, variables, embs[0], masks[0], **kw)
    s3, sc3 = generate_beam(
        model, [variables] * 3, [embs[0]] * 3, [masks[0]] * 3, **kw
    )
    np.testing.assert_array_equal(np.asarray(s1[:, 0]), np.asarray(s3[:, 0]))
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(sc3), rtol=1e-4, atol=1e-5)
