"""Constrained decoding parity vs fairseq's actual implementation.

The state machines (ops/constraints.py) and the search step
(ops/beam_search.py:_constrained_step_row) are compared against the
reference's OWN fairseq/fairseq/token_generation_constraints.py and
fairseq/fairseq/search.py LexicallyConstrainedBeamSearch, imported through
the vendored-fairseq loader.
"""
import importlib

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._vendored_fairseq import load_vendored_avhubert

import jax
import jax.numpy as jnp

from multimodalvc_tpu.ops import constraints as C

load_vendored_avhubert()  # sets up the 'fairseq' package path


def _fairseq_search():
    return importlib.import_module("fairseq.search")


def _fairseq_constraints():
    return importlib.import_module("fairseq.token_generation_constraints")


class _Dict:
    def __init__(self, vocab):
        self._v = vocab

    def pad(self):
        return 0

    def unk(self):
        return 1

    def eos(self):
        return 2

    def bos(self):
        return 3

    def __len__(self):
        return self._v


CONSTRAINTS = [
    [[5, 6, 7], [5], [9, 10]],
    [],
    [[4, 5], [5, 6]],  # shared token 5: exercises trie sharing + saturation
]


def test_pack_constraints_matches_fairseq():
    tgc = _fairseq_constraints()
    theirs = tgc.pack_constraints(
        [[torch.tensor(c) for c in sent] for sent in CONSTRAINTS]
    ).numpy()
    ours = C.pack_constraints(CONSTRAINTS)
    np.testing.assert_array_equal(ours, theirs)
    for i, sent in enumerate(CONSTRAINTS):
        assert C.unpack_constraints(ours[i]) == [list(c) for c in sent]


@pytest.mark.parametrize("row", [0, 2])
def test_unordered_state_machine_parity(row, rng):
    """Drive both automata with identical random token streams; bank,
    num_completed, finished and the next-token sets must agree at every
    step (token_generation_constraints.py:202-359)."""
    tgc = _fairseq_constraints()
    packed = C.pack_constraints(CONSTRAINTS)
    trie = C.build_unordered(packed)
    cons_row = jax.tree.map(
        lambda x: x[row] if hasattr(x, "ndim") and x.ndim else x, trie
    )

    ref = tgc.UnorderedConstraintState.create(torch.from_numpy(packed[row]))
    node = jnp.zeros((), jnp.int32)
    gen = jnp.zeros((trie.token.shape[1],), jnp.int32)
    comp = jnp.zeros_like(gen)

    adv = jax.jit(lambda n, g, c, t: C.unordered_advance(cons_row, n, g, c, t))
    toks = list(rng.integers(3, 12, 40)) + [5, 6, 7, 5, 9, 10, 5, 4, 5, 5, 6]
    for t in toks:
        ref = ref.advance(int(t))
        node, gen, comp = adv(node, gen, comp, jnp.int32(t))
        assert int(C.unordered_bank(gen)) == ref.bank, t
        assert int(
            C.unordered_num_completed(cons_row, node, comp)
        ) == ref.num_completed, t
        assert bool(C.unordered_finished(cons_row, node, comp)) == ref.finished, t
        cand_t, cand_ok = C.unordered_next_tokens(cons_row, node)
        ours_next = set(np.asarray(cand_t)[np.asarray(cand_ok)].tolist())
        assert ours_next == {int(x) for x in ref.next_tokens()}, t


@pytest.mark.parametrize("row", [0, 2])
def test_ordered_state_machine_parity(row, rng):
    tgc = _fairseq_constraints()
    packed = C.pack_constraints(CONSTRAINTS)
    seqs = C.build_ordered(packed)
    cons_row = jax.tree.map(
        lambda x: x[row] if hasattr(x, "ndim") and x.ndim else x, seqs
    )

    ref = tgc.OrderedConstraintState.create(torch.from_numpy(packed[row]))
    st = jnp.int32(-1)
    adv = jax.jit(lambda s, t: C.ordered_advance(cons_row, s, t))
    toks = list(rng.integers(3, 12, 40)) + [5, 6, 7, 5, 9, 10, 4, 5, 5, 6]
    for t in toks:
        ref = ref.advance(int(t))
        st = adv(st, jnp.int32(t))
        assert int(st) == ref.state, t
        assert int(C.ordered_bank(st)) == ref.bank, t
        assert int(C.ordered_num_completed(cons_row, st)) == ref.num_completed, t
        assert bool(C.ordered_finished(cons_row, st)) == ref.finished, t
        cand_t, cand_ok = C.ordered_next_tokens(cons_row, st)
        ours_next = set(np.asarray(cand_t)[np.asarray(cand_ok)].tolist())
        assert ours_next == {int(x) for x in ref.next_tokens()}, t


@pytest.mark.parametrize("mode", ["unordered", "ordered"])
def test_constrained_step_parity_vs_fairseq(mode, rng):
    """Multi-step parity of the full search step (scores/indices/beams in
    stripe order) vs fairseq LexicallyConstrainedBeamSearch.step
    (fairseq/fairseq/search.py:263-524)."""
    from functools import partial

    from multimodalvc_tpu.ops.beam_search import _constrained_step_row

    search = _fairseq_search()
    b, k, vocab, steps = 3, 4, 24, 6
    packed = C.pack_constraints(CONSTRAINTS)
    ref_search = search.LexicallyConstrainedBeamSearch(_Dict(vocab), mode)
    ref_search.init_constraints(torch.from_numpy(packed), k)

    if mode == "unordered":
        cons = C.build_unordered(packed)
        state = C.unordered_init(cons, k)
        cons_axes = type(cons)(
            token=0, parent=0, terminal=0, num_constraints=0, node_valid=0,
            num_constraint_tokens=0, max_depth=None,
        )
    else:
        cons = C.build_ordered(packed)
        state = C.ordered_init(cons, k)
        cons_axes = type(cons)(
            seq=0, endpoints=0, length=0, num_constraint_tokens=0, max_depth=None
        )

    step_fns = {
        s0: jax.jit(
            jax.vmap(
                partial(_constrained_step_row, k=k, is_step0=s0, mode=mode),
                in_axes=(0, 0, cons_axes, 0),
            )
        )
        for s0 in (True, False)
    }
    scores_hist = torch.zeros(b, k, steps + 1)
    for step in range(steps):
        lp = rng.standard_normal((b, k, vocab)).astype(np.float32)
        lp = np.log(np.exp(lp) / np.exp(lp).sum(-1, keepdims=True))
        lp_t = torch.from_numpy(lp.copy())
        ref_s, ref_i, ref_b = ref_search.step(
            step, lp_t, scores_hist[:, :, : max(step, 1)] if step > 0 else None
        )
        # fairseq's step bans EOS in lp_t IN PLACE; feed ours the same view
        our_lp = jnp.asarray(lp_t.numpy())
        our_scores = jnp.asarray(scores_hist[:, :, step - 1].numpy()) if step else (
            jnp.zeros((b, k), jnp.float32)
        )
        s2k, t2k, b2k, st2k = step_fns[step == 0](our_lp, our_scores, cons, state)

        np.testing.assert_allclose(
            np.asarray(s2k), ref_s.numpy(), rtol=1e-5, atol=1e-6,
            err_msg=f"step {step} scores",
        )
        np.testing.assert_array_equal(np.asarray(t2k), ref_i.numpy(), f"step {step}")
        np.testing.assert_array_equal(np.asarray(b2k), ref_b.numpy(), f"step {step}")

        # choose the first k candidates as the active hypotheses on both sides
        active = torch.arange(k).repeat(b, 1)
        ref_search.update_constraints(active)
        state = jax.tree.map(
            lambda x: x[:, :k], st2k
        )
        scores_hist[:, :, step] = ref_s[:, :k]


@pytest.mark.parametrize("mode", ["unordered", "ordered"])
@pytest.mark.slow
def test_constrained_generate_seq2seq_satisfies_constraints(mode, rng):
    """End-to-end: a tiny random seq2seq decoder forced through constraints
    emits every constraint (contiguously; in order for mode='ordered')."""
    from multimodalvc_tpu.nn.seq2seq import (
        Seq2SeqDecoder,
        Seq2SeqDecoderConfig,
        generate_seq2seq,
    )

    cfg = Seq2SeqDecoderConfig.tiny(vocab_size=32)
    dec = Seq2SeqDecoder(cfg)
    enc = jnp.asarray(rng.standard_normal((2, 7, cfg.d_model)), jnp.float32)
    enc_lens = jnp.asarray([7, 5], jnp.int32)
    variables = dec.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 1), jnp.int32), enc, enc_lens
    )
    constraints = C.pack_constraints([[[5, 6], [9]], [[11, 12, 13]]])
    seqs, scores = generate_seq2seq(
        dec,
        variables,
        enc,
        enc_lens,
        bos_token_id=cfg.eos_token_id,  # fairseq decodes from EOS as BOS
        max_new_tokens=16,
        num_beams=4,
        constraints=constraints,
        constraints_mode=mode,
    )
    best = np.asarray(seqs)[:, 0]  # [B, L]

    def contains(row, sub):
        row = row.tolist()
        for s in range(len(row) - len(sub) + 1):
            if row[s : s + len(sub)] == sub:
                return s
        return -1

    assert contains(best[0], [5, 6]) >= 0, best[0]
    assert contains(best[0], [9]) >= 0, best[0]
    assert contains(best[1], [11, 12, 13]) >= 0, best[1]
    if mode == "ordered":
        assert contains(best[0], [5, 6]) < contains(best[0], [9])


@pytest.mark.slow  # edge-case variant; fairseq parity tests stay fast
def test_constrained_unsatisfiable_returns_best_effort(rng):
    """Constraints that cannot fit in max_new_tokens: the search must return
    the best-effort live hypotheses (fairseq force-finalizes at max-len),
    not pad-filled rows."""
    from multimodalvc_tpu.ops.beam_search import constrained_beam_search

    b, k, vocab, L = 1, 2, 16, 3
    packed = C.pack_constraints([[[5, 6, 7, 8, 9]]])  # 5 tokens > 3 budget
    cons = C.build_unordered(packed)
    logits = jnp.asarray(rng.standard_normal((b, vocab)), jnp.float32)

    def decode_fn(tokens, positions, cache):
        return jnp.tile(logits, (tokens.shape[0], 1)), cache

    seqs, scores = constrained_beam_search(
        decode_fn, {}, jnp.ones((b,), jnp.int32), logits,
        eos_token_id=2, pad_token_id=0, max_new_tokens=L,
        constraint_set=cons, num_beams=k, mode="unordered",
    )
    best = np.asarray(seqs)[0, 0]
    assert not (best == 0).all(), best  # not pure pad
    assert np.isfinite(np.asarray(scores)[0, 0])
    # bank striping keeps constraint-progressing hypotheses in the beam:
    # some returned beam carries constraint tokens
    assert any(5 in np.asarray(seqs)[0, j] for j in range(k)), np.asarray(seqs)


def test_generate_beam_with_constraints(rng):
    """Constrained transcription through the product LLaMA decode path
    (generate_beam + prefilled KV cache)."""
    from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel, generate_beam

    cfg = LlamaConfig.tiny()
    cfg.lora = None
    model = LlamaModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        inputs_embeds=jnp.zeros((1, 4, 64), jnp.float32),
        attn_mask=jnp.ones((1, 4), jnp.int32),
    )
    emb = jnp.asarray(rng.standard_normal((2, 7, 64)) * 0.05, jnp.float32)
    mask = np.ones((2, 7), np.int64)
    mask[1, :3] = 0
    cons = C.build_unordered(C.pack_constraints([[[17, 18]], [[40]]]))
    seqs, scores = generate_beam(
        model, variables, emb, jnp.asarray(mask),
        eos_token_id=2, pad_token_id=0, num_beams=4, max_new_tokens=10,
        cache_dtype=jnp.float32, constraints=cons,
    )
    best = np.asarray(seqs)[:, 0]
    row0 = best[0].tolist()
    assert any(row0[i : i + 2] == [17, 18] for i in range(len(row0) - 1)), row0
    assert 40 in best[1].tolist(), best[1]
