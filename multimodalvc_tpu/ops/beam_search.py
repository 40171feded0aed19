"""Batched beam search as a single `lax.while_loop` XLA program.

Replaces HF ``model.generate`` in the reference decode path
(reference: src/model.py:478-485 — num_beams=5, max_new_tokens=100; HF
ignores the temperature arg without do_sample, so this is pure beam search
with length_penalty on finalization like HF BeamHypotheses).

Design: the caller prefits the prompt into a KV cache (left-padded, HF
generate's cumsum position semantics), then this loop decodes one token per
iteration for all B*K beams simultaneously.  Everything is static-shape:
``max_new_tokens`` bounds the loop, finished beams keep emitting pad and are
score-frozen.  Cache reordering after beam selection is a gather on the
batch axis, which XLA turns into an efficient dynamic-gather on TPU.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


class BeamState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # scalar int32 — tokens generated so far
    live_seqs: jnp.ndarray  # [B, K, L] int32
    live_scores: jnp.ndarray  # [B, K] cumulative logprob
    finished_seqs: jnp.ndarray  # [B, K, L]
    finished_scores: jnp.ndarray  # [B, K] length-penalized
    finished_flags: jnp.ndarray  # [B, K] bool
    cache: Any  # pytree with leaves [B*K, ...]


def _flatten_beam(x):
    return x.reshape((-1,) + x.shape[2:])


def _unflatten_beam(x, b, k):
    return x.reshape((b, k) + x.shape[1:])


def _gather_beams(tree, indices, b, k):
    """Select beams: indices [B, K] into the K axis of [B, K, ...] leaves.

    Large float leaves (the KV cache) reorder via a one-hot einsum: XLA
    lowers take_along_axis over a big trailing dim to a K-way select chain
    that re-reads the whole cache K times per step (quadratic in beams —
    measured 3x decode slowdown going beam 5 -> 10 at equal rows).  A one-hot
    [B, K, K] contraction reads each cache byte once and is exact (1.0/0.0
    weights select values bit-exactly).  Gated to k >= 8: at small K the
    select lowering is competitive and the einsum's tile padding loses
    (measured at beam 5; re-measured r3 at batch 48 with the split gen
    cache — einsum 2.88 s vs take_along_axis 2.85 s per 64-step decode,
    still no win, even though the gather+select_n pair is ~10 ms/step,
    2.3x its HBM roofline)."""
    onehot = None

    def gather(x, skip=False):
        nonlocal onehot
        if skip or x.ndim == 0 or x.shape[0] != b * k:
            return x  # scalar leaves (e.g. cache write index) are beam-invariant
        if (
            x.ndim >= 3
            and x.size >= (1 << 18)
            and jax.default_backend() == "tpu"
            and x.shape[-1] % 128 == 0
        ):
            # big KV-cache leaves: DMA-driven gather (ops/beam_gather.py) —
            # one read + one write per byte; the take_along_axis lowering's
            # gather + K-way select_n chain measured 2.3x roofline in-loop
            from .beam_gather import gather_beams_rows

            return gather_beams_rows(x, indices, b, k)
        xb = _unflatten_beam(x, b, k)
        if (
            k >= 8
            and xb.dtype in (jnp.float32, jnp.bfloat16, jnp.float16)
            and xb.size >= (1 << 18)
        ):
            if onehot is None:
                onehot = jax.nn.one_hot(indices, k, dtype=xb.dtype)  # [B, K, K]
            flat = xb.reshape(b, k, -1)
            out = jnp.einsum(
                "bkj,bjf->bkf", onehot.astype(xb.dtype), flat,
                preferred_element_type=xb.dtype,
            ).reshape(xb.shape)
            return _flatten_beam(out)
        out = jnp.take_along_axis(
            xb, indices.reshape((b, k) + (1,) * (xb.ndim - 2)), axis=1
        )
        return _flatten_beam(out)

    def gather_path(path, x):
        # 'fixed_*' cache leaves opt out of the reorder: the ancestry decode
        # cache (nn/llama.py split-cache anc branch) never moves its gen KV —
        # only the small 'anc' map is gathered
        skip = any(
            str(getattr(p, "key", "")).startswith("fixed_") for p in path
        )
        return gather(x, skip=skip)

    return jax.tree_util.tree_map_with_path(gather_path, tree)


def apply_ngram_block(
    logp: jnp.ndarray,  # [B, K, V]
    seqs: jnp.ndarray,  # [B, K, L] generated tokens so far
    step: jnp.ndarray,  # scalar: tokens generated
    ngram: int,
) -> jnp.ndarray:
    """Mask tokens that would complete a repeated n-gram (device-side analog
    of the reference's ngram_repeat_block CUDA kernel,
    fairseq/fairseq/clib/cuda/ngram_repeat_block_cuda_kernel.cu:1-76)."""
    b, k, vocab = logp.shape
    l = seqs.shape[2]
    n1 = ngram - 1
    if l < ngram:
        return logp
    # suffix: the last n-1 generated tokens (positions step-n+1 .. step-1)
    suf_idx = step - n1 + jnp.arange(n1)  # valid iff step >= n1
    suffix = jnp.take_along_axis(
        seqs, jnp.broadcast_to(jnp.clip(suf_idx, 0, l - 1), (b, k, n1)), axis=2
    )  # [B, K, n-1]
    # all (n-1)-gram windows and their following token
    windows = jnp.stack([seqs[:, :, s : s + n1] for s in range(l - n1)], axis=2)
    follows = seqs[:, :, n1:]  # [B, K, S]
    match = jnp.all(windows == suffix[:, :, None, :], axis=-1)  # [B, K, S]
    # only windows fully inside the generated region (window end < step)
    s_pos = jnp.arange(l - n1)
    match = match & (s_pos[None, None, :] + n1 <= step - 1) & (step >= n1)
    banned = jnp.where(match, follows, vocab)  # vocab = out-of-range -> dropped
    flat = logp.reshape(b * k, vocab)
    flat = flat.at[
        jnp.arange(b * k)[:, None], banned.reshape(b * k, -1)
    ].set(NEG_INF, mode="drop")
    return flat.reshape(b, k, vocab)


def beam_search(
    decode_fn: Callable[[jnp.ndarray, jnp.ndarray, Any], Tuple[jnp.ndarray, Any]],
    init_cache: Any,  # leaves [B*K, ...] pre-filled with the prompt
    prompt_lengths: jnp.ndarray,  # [B] valid prompt length per row
    first_logits: jnp.ndarray,  # [B, V] logits at the last prompt position
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
    num_beams: int = 5,
    length_penalty: float = 1.0,
    no_repeat_ngram_size: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run beam search; returns (sequences [B, K, max_new_tokens], scores [B, K]).

    ``decode_fn(tokens [B*K, 1], positions [B*K, 1], cache) -> (logits [B*K, V],
    cache)`` runs one decoder step.  ``first_logits`` come from the caller's
    prompt prefill so the first expansion is exact.
    """
    b = first_logits.shape[0]
    k = num_beams
    vocab = first_logits.shape[-1]
    l = max_new_tokens

    # --- first expansion: top-K tokens from the prompt's last logits -------
    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)  # [B, V]
    top_scores, top_tokens = jax.lax.top_k(logp0, k)  # [B, K]

    live_seqs = jnp.full((b, k, l), pad_token_id, jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(top_tokens)
    live_scores = top_scores
    # beams that opened with EOS are immediately finished
    eos0 = top_tokens == eos_token_id
    finished_seqs = live_seqs
    finished_scores = jnp.where(eos0, top_scores / (1.0**length_penalty), NEG_INF)
    finished_flags = eos0
    live_scores = jnp.where(eos0, NEG_INF, live_scores)

    state = BeamState(
        step=jnp.ones((), jnp.int32),
        live_seqs=live_seqs,
        live_scores=live_scores,
        finished_seqs=finished_seqs,
        finished_scores=finished_scores,
        finished_flags=finished_flags,
        cache=init_cache,
    )

    def cond(state: BeamState):
        if_not_done = state.step < l
        # early exit: best possible live score can't beat worst finished
        best_live = jnp.max(state.live_scores, axis=1) / (
            jnp.float32(l) ** length_penalty if length_penalty > 0 else 1.0
        )
        worst_finished = jnp.min(
            jnp.where(state.finished_flags, state.finished_scores, NEG_INF), axis=1
        )
        all_done = jnp.all(state.finished_flags, axis=1)
        improvement_possible = jnp.any(
            jnp.logical_or(~all_done, best_live > worst_finished)
        )
        return jnp.logical_and(if_not_done, improvement_possible)

    def body(state: BeamState):
        step = state.step
        prev_tokens = jax.lax.dynamic_slice_in_dim(state.live_seqs, step - 1, 1, axis=2)
        flat_tokens = _flatten_beam(prev_tokens)  # [B*K, 1]
        positions = (prompt_lengths[:, None] + step - 1).repeat(k, axis=0).reshape(-1, 1)
        # NOTE: positions follow HF generate semantics: prompt_len + step - 1
        logits, new_cache = decode_fn(flat_tokens, positions, state.cache)

        # 2K candidates so EOS picks never starve the live set (HF-style).
        # On TPU the fused Pallas kernel (ops/topk.py) avoids materialising
        # the [B, K*V] candidate row and beats XLA's TopK custom call
        # (3.9 ms/step at [48, 641280] in the r3 trace).
        # NEGATIVE RESULT (r3, v5e): a two-stage *XLA* block top-k (per-block
        # top_k, then re-reduce the winners) measured ~5.7 ms/step SLOWER
        # than the single lax.top_k — the win needs VMEM residency, not
        # blocking; don't re-attempt the XLA variant.
        on_tpu = jax.default_backend() == "tpu"
        if on_tpu and no_repeat_ngram_size == 0:
            # fused serving path: the RAW [B*K, V] unembed logits plus
            # per-row max / logsumexp scalars go straight into the Pallas
            # top-2K, which applies ((x - max) - logS) + score in XLA's
            # log_softmax op order — the f32 log-prob tensor is never
            # materialised (its fused subtract: 0.37 ms/step, r5 trace).
            # The column-champion variant reduces the K beam rows to one
            # per-column champion before the extraction passes (4.71 ->
            # 2.86 ms/step for the whole normalise+topk pipeline at
            # [240, 128256] on the v5e, bit-identical outputs).
            from .topk import beam_topk_columns, beam_topk_from_logits

            lf = logits.astype(jnp.float32)
            row_max = jnp.max(lf, axis=-1, keepdims=True)
            row_ls = jnp.log(
                jnp.sum(jnp.exp(lf - row_max), axis=-1, keepdims=True)
            )
            fused = beam_topk_columns if vocab % 8 == 0 else beam_topk_from_logits
            top2k_scores, top2k_idx = fused(
                lf, row_max, row_ls, state.live_scores, 2 * k
            )
        else:
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            logp = _unflatten_beam(logp, b, k)  # [B, K, V]
            if no_repeat_ngram_size > 0:
                logp = apply_ngram_block(
                    logp, state.live_seqs, step, no_repeat_ngram_size
                )
            if on_tpu:
                from .topk import beam_topk

                top2k_scores, top2k_idx = beam_topk(
                    logp, state.live_scores, 2 * k
                )
            else:
                cand = state.live_scores[:, :, None] + logp  # [B, K, V]
                flat_cand = cand.reshape(b, k * vocab)
                top2k_scores, top2k_idx = jax.lax.top_k(flat_cand, 2 * k)
        cand_beam = top2k_idx // vocab  # [B, 2K]
        cand_token = top2k_idx % vocab

        seqs2k = jnp.take_along_axis(state.live_seqs, cand_beam[:, :, None], axis=1)
        seqs2k = jax.lax.dynamic_update_slice_in_dim(
            seqs2k, cand_token[:, :, None].astype(jnp.int32), step, axis=2
        )
        is_eos = cand_token == eos_token_id

        # ---- update finished set -----------------------------------------
        gen_len = (step + 1).astype(jnp.float32)
        fin_cand_scores = jnp.where(
            is_eos, top2k_scores / (gen_len**length_penalty), NEG_INF
        )
        all_fin_seqs = jnp.concatenate([state.finished_seqs, seqs2k], axis=1)
        all_fin_scores = jnp.concatenate([state.finished_scores, fin_cand_scores], axis=1)
        all_fin_flags = jnp.concatenate(
            [state.finished_flags, is_eos], axis=1
        )
        top_fin_scores, top_fin_idx = jax.lax.top_k(all_fin_scores, k)
        finished_seqs = jnp.take_along_axis(all_fin_seqs, top_fin_idx[:, :, None], axis=1)
        finished_flags = jnp.take_along_axis(all_fin_flags, top_fin_idx, axis=1)

        # ---- update live set (top K non-EOS) -------------------------------
        live_cand_scores = jnp.where(is_eos, NEG_INF, top2k_scores)
        new_live_scores, live_idx = jax.lax.top_k(live_cand_scores, k)
        live_seqs = jnp.take_along_axis(seqs2k, live_idx[:, :, None], axis=1)
        live_beam = jnp.take_along_axis(cand_beam, live_idx, axis=1)  # [B, K]

        new_cache = _gather_beams(new_cache, live_beam, b, k)

        return state.replace(
            step=step + 1,
            live_seqs=live_seqs,
            live_scores=new_live_scores,
            finished_seqs=finished_seqs,
            finished_scores=top_fin_scores,
            finished_flags=finished_flags,
            cache=new_cache,
        )

    state = jax.lax.while_loop(cond, body, state)

    # HF finalize semantics (BeamSearchScorer.finalize): live beams COMPETE
    # with the finished pool at loop exit, normalized at their actual
    # generated length — not only when nothing finished.  (At an early exit
    # the cond's conservative bound already proves no live beam can win, so
    # merging unconditionally is exact; at budget exit step == l.)  A prior
    # version only fell back to live beams when the finished set was empty,
    # which kept a short early-EOS hypothesis over a better long live one.
    gen_len_final = jnp.maximum(state.step.astype(jnp.float32), 1.0)
    final_live_scores = state.live_scores / (gen_len_final**length_penalty)
    all_seqs = jnp.concatenate([state.finished_seqs, state.live_seqs], axis=1)
    all_scores = jnp.concatenate([state.finished_scores, final_live_scores], axis=1)
    scores, order = jax.lax.top_k(all_scores, k)  # [B, K] best of finished+live
    seqs = jnp.take_along_axis(all_seqs, order[:, :, None], axis=1)
    return seqs, scores


def greedy_search(
    decode_fn,
    init_cache,
    prompt_lengths: jnp.ndarray,
    first_logits: jnp.ndarray,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
):
    """Greedy decode (beam=1 fast path). Returns sequences [B, max_new_tokens]."""
    b = first_logits.shape[0]
    seqs = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
    tok0 = jnp.argmax(first_logits, axis=-1).astype(jnp.int32)
    seqs = seqs.at[:, 0].set(tok0)
    done0 = tok0 == eos_token_id

    def cond(carry):
        step, seqs, done, cache = carry
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(carry):
        step, seqs, done, cache = carry
        prev = jax.lax.dynamic_slice_in_dim(seqs, step - 1, 1, axis=1)
        positions = (prompt_lengths + step - 1)[:, None]
        logits, cache = decode_fn(prev, positions, cache)  # [B, V]
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_token_id, nxt)
        seqs = jax.lax.dynamic_update_slice_in_dim(seqs, nxt[:, None], step, axis=1)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return (step + 1, seqs, done, cache)

    _, seqs, _, _ = jax.lax.while_loop(cond, body, (jnp.ones((), jnp.int32), seqs, done0, init_cache))
    return seqs


def _filter_logits(
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Temperature + top-k + nucleus filtering (reference analog:
    fairseq/fairseq/search.py Sampling with sampling_topk/sampling_topp)."""
    if temperature != 1.0:
        logits = logits / jnp.float32(max(temperature, 1e-6))
    if top_k and top_k > 0:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep the smallest prefix with cumulative mass >= top_p (always >= 1 tok)
        cutoff_mask = cum - probs < top_p
        threshold = jnp.min(
            jnp.where(cutoff_mask, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, NEG_INF, logits)
    return logits


def sample_search(
    decode_fn,
    init_cache,
    prompt_lengths: jnp.ndarray,
    first_logits: jnp.ndarray,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
    rng: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
):
    """Ancestral sampling decode in one lax.while_loop.

    Returns sequences [B, max_new_tokens].  Same decode_fn contract as
    beam_search/greedy_search.
    """
    b = first_logits.shape[0]
    rng, r0 = jax.random.split(rng)
    filt0 = _filter_logits(first_logits.astype(jnp.float32), temperature, top_k, top_p)
    tok0 = jax.random.categorical(r0, filt0, axis=-1).astype(jnp.int32)
    seqs = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32).at[:, 0].set(tok0)
    done0 = tok0 == eos_token_id

    def cond(carry):
        step, _, done, _, _ = carry
        return jnp.logical_and(step < max_new_tokens, ~jnp.all(done))

    def body(carry):
        step, seqs, done, cache, rng = carry
        rng, r = jax.random.split(rng)
        prev = jax.lax.dynamic_slice_in_dim(seqs, step - 1, 1, axis=1)
        positions = (prompt_lengths + step - 1)[:, None]
        logits, cache = decode_fn(prev, positions, cache)
        filt = _filter_logits(logits.astype(jnp.float32), temperature, top_k, top_p)
        nxt = jax.random.categorical(r, filt, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, pad_token_id, nxt)
        seqs = jax.lax.dynamic_update_slice_in_dim(seqs, nxt[:, None], step, axis=1)
        done = jnp.logical_or(done, nxt == eos_token_id)
        return (step + 1, seqs, done, cache, rng)

    _, seqs, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.ones((), jnp.int32), seqs, done0, init_cache, rng)
    )
    return seqs


def _constrained_step_row(
    logp,  # [K, V] this step's log-probs (EOS pre-banned for unfinished)
    scores,  # [K] cumulative scores
    cons,  # one row of TrieArrays / SequenceArrays
    state,  # one row of the constraint state pytree (leaves [K, ...])
    *,
    k: int,
    is_step0: bool,
    mode: str,
):
    """One row of LexicallyConstrainedBeamSearch.step + step_sentence
    (fairseq/fairseq/search.py:263-524) with static shapes.

    Candidates = top-2K over the flattened cumulative scores, plus (step>0)
    the top-1 of every beam, plus every beam's constraint next-tokens; all
    candidates are advanced through the constraint automaton, sorted by
    fairseq's (bank, score) key, deduped on (beam, token), striped
    round-robin across banks, and truncated to 2K.  Returns
    (scores [2K], tokens [2K], beams [2K], new_state leaves [2K, ...]).
    """
    from . import constraints as C

    kv = logp.shape[-1]
    if is_step0:
        # fairseq uses only the first beam at step 0 (search.py:326-328)
        cum = jnp.where(jnp.arange(k)[:, None] == 0, logp, NEG_INF)
    else:
        cum = scores[:, None] + logp  # [K, V]

    s_top, i_top = jax.lax.top_k(cum.reshape(-1), 2 * k)
    cand_s = [s_top]
    cand_t = [(i_top % kv).astype(jnp.int32)]
    cand_b = [(i_top // kv).astype(jnp.int32)]
    cand_ok = [jnp.ones((2 * k,), bool)]

    if not is_step0:
        # STEP 1: top-1 of each hypothesis (search.py:347-358)
        s1 = jnp.max(cum, axis=-1)
        t1 = jnp.argmax(cum, axis=-1).astype(jnp.int32)
        cand_s.append(s1)
        cand_t.append(t1)
        cand_b.append(jnp.arange(k, dtype=jnp.int32))
        cand_ok.append(jnp.ones((k,), bool))

    # STEP 2: every beam's constraint next-tokens (step_sentence :398-410);
    # at step 0 only beam 0's (the loop breaks, :412-414)
    if mode == "unordered":
        nt = jax.vmap(lambda n: C.unordered_next_tokens(cons, n))(state.node)
    else:
        nt = jax.vmap(lambda s: C.ordered_next_tokens(cons, s))(state)
    ctoks, cok = nt  # [K, Cn]
    cn = ctoks.shape[-1]
    if is_step0:
        cok = cok & (jnp.arange(k)[:, None] == 0)
    safe_t = jnp.clip(ctoks, 0, kv - 1)
    cscores = jnp.take_along_axis(cum, safe_t, axis=-1)  # [K, Cn]
    cand_s.append(cscores.reshape(-1))
    cand_t.append(safe_t.reshape(-1).astype(jnp.int32))
    cand_b.append(jnp.repeat(jnp.arange(k, dtype=jnp.int32), cn))
    cand_ok.append(cok.reshape(-1))

    s_all = jnp.concatenate(cand_s)
    t_all = jnp.concatenate(cand_t)
    b_all = jnp.concatenate(cand_b)
    ok_all = jnp.concatenate(cand_ok)
    c = s_all.shape[0]

    # STEP 3: advance every candidate through the automaton -> banks
    if mode == "unordered":
        def adv(bm, tok):
            return C.unordered_advance(
                cons, state.node[bm], state.generated[bm], state.completed[bm], tok
            )

        node_c, gen_c, comp_c = jax.vmap(adv)(b_all, t_all)
        new_state = C.UnorderedState(node=node_c, generated=gen_c, completed=comp_c)
        banks = C.unordered_bank(gen_c)
    else:
        new_state = jax.vmap(lambda bm, tok: C.ordered_advance(cons, state[bm], tok))(
            b_all, t_all
        )
        banks = C.ordered_bank(new_state)

    # STEP 4: sort by fairseq's exact key (search.py:436-443):
    # (num_constraint_tokens - banks) * MAX_SCORE + score, descending
    t_total = cons.num_constraint_tokens.astype(jnp.float32)
    key = (t_total - banks.astype(jnp.float32)) * (-100.0) + s_all
    key = jnp.where(ok_all, key, -3.0e38)
    order = jnp.argsort(-key)  # stable: ties keep candidate order
    rank = jnp.zeros((c,), jnp.int32).at[order].set(jnp.arange(c, dtype=jnp.int32))

    # STEP 5: dedup (beam, token) keeping the first in sort order (:454-480)
    ids = b_all * (kv + 1) + t_all
    same = (ids[None, :] == ids[:, None]) & ok_all[None, :]
    earlier = rank[None, :] < rank[:, None]
    ok_all = ok_all & ~jnp.any(same & earlier, axis=1)

    # STEP 6+7: stripe round-robin across banks and re-sort (:480-517).
    # fairseq's cur_bank_count resets at every CONTIGUOUS-run boundary of the
    # (deduped, key-sorted) list — not per bank value globally.  The sort key
    # is usually bank-grouped, but a >100 score spread between adjacent banks
    # (MAX_SCORE = -100) interleaves them and the two countings diverge, so
    # compute run positions exactly: compact the valid entries in sort order,
    # find run starts where the bank changes, and take index - run_start.
    compact = jnp.argsort(jnp.where(ok_all, rank, jnp.int32(1 << 30)))  # valid first
    bank_seq = banks[compact]
    pos = jnp.arange(c, dtype=jnp.int32)
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), bank_seq[1:] != bank_seq[:-1]]
    )
    start_idx = jax.lax.cummax(jnp.where(run_start, pos, 0))
    cnt_seq = pos - start_idx
    cnt = jnp.zeros((c,), jnp.int32).at[compact].set(cnt_seq)
    l_valid = jnp.sum(ok_all).astype(jnp.int32)
    stripes = (
        t_total.astype(jnp.int32) - banks + cnt * (l_valid + 1)
    )
    stripes = jnp.where(ok_all, stripes, jnp.int32(1 << 30))
    _, _, perm = jax.lax.sort(
        (stripes, rank, jnp.arange(c, dtype=jnp.int32)), dimension=0, num_keys=2
    )
    sel = perm[: 2 * k]  # STEP 8: truncate (:518-522); >=2K uniques always

    gather_state = jax.tree.map(lambda x: x[sel], new_state)
    return s_all[sel], t_all[sel], b_all[sel], gather_state


def constrained_beam_search(
    decode_fn,
    init_cache,
    prompt_lengths: jnp.ndarray,
    first_logits: jnp.ndarray,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
    constraint_set,  # ops.constraints.TrieArrays | SequenceArrays (leaves [B, ...])
    num_beams: int = 5,
    length_penalty: float = 1.0,
    mode: str = "unordered",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lexically-constrained beam search (fairseq
    LexicallyConstrainedBeamSearch, search.py:433-524, over our shared
    while-loop decoder).  Hypotheses are striped across constraint banks
    every step, guaranteeing progress through the constraints; EOS is banned
    until a hypothesis has satisfied all its constraints (search.py:310-323).

    Candidate semantics (selection window, bank striping, dedup, sort keys)
    follow fairseq exactly — parity-tested per step in
    tests/test_constrained.py.  Finalization keeps this framework's HF-style
    merge (live beams compete with the finished pool at exit).  Rows whose
    constraint set is empty degrade to plain beam search.
    """
    from . import constraints as C

    b = first_logits.shape[0]
    k = num_beams
    vocab = first_logits.shape[-1]
    l = max_new_tokens
    if 2 * k > vocab:
        raise ValueError("constrained search needs 2*beam <= vocab")

    if mode == "unordered":
        state0 = C.unordered_init(constraint_set, k)
        cons_axes = type(constraint_set)(
            token=0, parent=0, terminal=0, num_constraints=0, node_valid=0,
            num_constraint_tokens=0, max_depth=None,
        )

        def is_finished(state):  # [B, K] bool
            return jax.vmap(
                lambda cr, nd, cp: jax.vmap(
                    lambda n_, c_: C.unordered_finished(cr, n_, c_)
                )(nd, cp),
                in_axes=(cons_axes, 0, 0),
            )(constraint_set, state.node, state.completed)

    else:
        state0 = C.ordered_init(constraint_set, k)
        cons_axes = type(constraint_set)(
            seq=0, endpoints=0, length=0, num_constraint_tokens=0, max_depth=None
        )

        def is_finished(state):
            return jax.vmap(
                lambda cr, st: jax.vmap(lambda s_: C.ordered_finished(cr, s_))(st),
                in_axes=(cons_axes, 0),
            )(constraint_set, state)

    def run_step(logp, scores, state, is_step0):
        return jax.vmap(
            partial(_constrained_step_row, k=k, is_step0=is_step0, mode=mode),
            in_axes=(0, 0, cons_axes, 0),
        )(logp, scores, constraint_set, state)

    # ---- step 0: expand from the prompt logits (beam 0 only) ---------------
    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)
    # fairseq's generator enforces min_len >= 1 (sequence_generator.py:366:
    # lprobs[:, eos] = -inf while step < min_len), which is what keeps an
    # unfinished-constraint hypothesis from finalizing at step 0
    logp0 = logp0.at[:, eos_token_id].set(NEG_INF)
    logp0 = jnp.broadcast_to(logp0[:, None], (b, k, vocab))
    s2k, t2k, b2k, st2k = run_step(logp0, jnp.zeros((b, k), jnp.float32), state0, True)

    def select_live(s2k, t2k, b2k, is_eos):
        """First K non-EOS candidates in stripe order (the generator picks
        actives by candidate order, not score — sequence_generator.py:528-538)."""
        pos = jnp.broadcast_to(jnp.arange(2 * k, dtype=jnp.int32), is_eos.shape)
        _, perm = jax.lax.sort((is_eos.astype(jnp.int32), pos), dimension=1, num_keys=1)
        return perm[:, :k]  # stable sort keeps candidate order within non-EOS

    is_eos0 = t2k == eos_token_id
    live_idx0 = select_live(s2k, t2k, b2k, is_eos0)
    live_tok = jnp.take_along_axis(t2k, live_idx0, axis=1)
    live_scores = jnp.take_along_axis(s2k, live_idx0, axis=1)
    live_state = jax.tree.map(
        lambda x: jnp.take_along_axis(
            x, live_idx0.reshape(live_idx0.shape + (1,) * (x.ndim - 2)), axis=1
        ),
        st2k,
    )
    live_seqs = jnp.full((b, k, l), pad_token_id, jnp.int32).at[:, :, 0].set(live_tok)

    # EOS candidates inside the first-K window finalize (sequence_generator
    # only finalizes cands[:, :beam_size])
    win_eos = is_eos0 & (jnp.arange(2 * k) < k)[None, :]
    fin_seqs0 = jnp.full((b, 2 * k, l), pad_token_id, jnp.int32).at[:, :, 0].set(t2k)
    fin_scores0 = jnp.where(win_eos, s2k / (1.0**length_penalty), NEG_INF)
    _, fin_idx = jax.lax.top_k(fin_scores0, k)
    finished_seqs = jnp.take_along_axis(fin_seqs0, fin_idx[:, :, None], axis=1)
    finished_scores = jnp.take_along_axis(fin_scores0, fin_idx, axis=1)
    finished_flags = finished_scores > NEG_INF / 2

    state = (
        jnp.ones((), jnp.int32),
        live_seqs,
        live_scores,
        live_state,
        finished_seqs,
        finished_scores,
        finished_flags,
        init_cache,
    )

    def cond(carry):
        step, _, _, _, _, _, flags, _ = carry
        return jnp.logical_and(step < l, ~jnp.all(flags))

    def body(carry):
        (step, live_seqs, live_scores, live_state,
         fin_seqs, fin_scores, fin_flags, cache) = carry
        prev = jax.lax.dynamic_slice_in_dim(live_seqs, step - 1, 1, axis=2)
        flat_tokens = prev.reshape(b * k, 1)
        positions = (prompt_lengths[:, None] + step - 1).repeat(k, axis=0).reshape(-1, 1)
        logits, cache = decode_fn(flat_tokens, positions, cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(b, k, vocab)
        # ban EOS while constraints are unsatisfied (search.py:310-323)
        unfin = ~is_finished(live_state)
        logp = logp.at[:, :, eos_token_id].set(
            jnp.where(unfin, NEG_INF, logp[:, :, eos_token_id])
        )

        s2k, t2k, b2k, st2k = run_step(logp, live_scores, live_state, False)
        seqs2k = jnp.take_along_axis(live_seqs, b2k[:, :, None], axis=1)
        seqs2k = jax.lax.dynamic_update_slice_in_dim(
            seqs2k, t2k[:, :, None], step, axis=2
        )
        is_eos = t2k == eos_token_id

        gen_len = (step + 1).astype(jnp.float32)
        win = (jnp.arange(2 * k) < k)[None, :]
        f_cand = jnp.where(is_eos & win, s2k / (gen_len**length_penalty), NEG_INF)
        all_f_seqs = jnp.concatenate([fin_seqs, seqs2k], axis=1)
        all_f_scores = jnp.concatenate([fin_scores, f_cand], axis=1)
        all_f_flags = jnp.concatenate([fin_flags, f_cand > NEG_INF / 2], axis=1)
        top_f, f_idx = jax.lax.top_k(all_f_scores, k)
        fin_seqs = jnp.take_along_axis(all_f_seqs, f_idx[:, :, None], axis=1)
        fin_flags = jnp.take_along_axis(all_f_flags, f_idx, axis=1)

        live_idx = select_live(s2k, t2k, b2k, is_eos)
        new_scores = jnp.take_along_axis(s2k, live_idx, axis=1)
        new_seqs = jnp.take_along_axis(seqs2k, live_idx[:, :, None], axis=1)
        new_beam = jnp.take_along_axis(b2k, live_idx, axis=1)
        new_state = jax.tree.map(
            lambda x: jnp.take_along_axis(
                x, live_idx.reshape(live_idx.shape + (1,) * (x.ndim - 2)), axis=1
            ),
            st2k,
        )
        cache = _gather_beams(cache, new_beam, b, k)
        return (step + 1, new_seqs, new_scores, new_state,
                fin_seqs, top_f, fin_flags, cache)

    (step, live_seqs, live_scores, live_state,
     fin_seqs, fin_scores, fin_flags, _) = jax.lax.while_loop(cond, body, state)

    # finalize: live hypotheses compete with the finished pool ONLY if their
    # constraint state is satisfied.  This matches fairseq's max-len endgame:
    # the generator forces EOS at the budget and the constrained search bans
    # EOS for unfinished states, so constraint-violating hypotheses reach the
    # output with -inf scores (i.e. only when nothing satisfied exists).
    gen_len_final = jnp.maximum(step.astype(jnp.float32), 1.0)
    norm_live = live_scores / (gen_len_final**length_penalty)
    final_live = jnp.where(is_finished(live_state), norm_live, NEG_INF)
    all_seqs = jnp.concatenate([fin_seqs, live_seqs], axis=1)
    all_scores = jnp.concatenate([fin_scores, final_live], axis=1)
    scores, order = jax.lax.top_k(all_scores, k)
    best = jnp.take_along_axis(all_seqs, order[:, :, None], axis=1)
    # rows where NOTHING satisfied its constraints (budget too small, or
    # unsatisfiable): fairseq still emits the best-effort hypothesis tokens
    # at max-len rather than empties — fall back to the live beams by score
    nothing = ~jnp.any(all_scores > NEG_INF / 2, axis=1)  # [B]
    live_rank_scores, live_order = jax.lax.top_k(norm_live, k)
    live_sorted = jnp.take_along_axis(live_seqs, live_order[:, :, None], axis=1)
    best = jnp.where(nothing[:, None, None], live_sorted, best)
    scores = jnp.where(nothing[:, None], live_rank_scores, scores)
    return best, scores


def diverse_beam_search(
    decode_fn,
    init_cache,
    prompt_lengths: jnp.ndarray,
    first_logits: jnp.ndarray,
    eos_token_id: int,
    pad_token_id: int,
    max_new_tokens: int,
    num_beams: int = 6,
    num_groups: int = 2,
    diversity_strength: float = 0.5,
    length_penalty: float = 1.0,
):
    """Diverse beam search (Vijayakumar et al. 16; reference analog:
    fairseq/fairseq/search.py DiverseBeamSearch).

    Beams are split into ``num_groups`` groups; at every step group g's
    candidate log-probs are penalised by ``diversity_strength`` times the
    number of times each token was already picked by groups < g at this
    step.  Each group otherwise runs standard beam search.  Returns
    (sequences [B, K, L], scores [B, K]) sorted per-group then merged.
    """
    if num_beams % num_groups:
        raise ValueError("num_beams must be divisible by num_groups")
    kg = num_beams // num_groups
    b, vocab = first_logits.shape
    l = max_new_tokens

    logp0 = jax.nn.log_softmax(first_logits.astype(jnp.float32), axis=-1)

    # --- first expansion with diversity across groups -----------------------
    seqs, scores, div = [], [], jnp.zeros((b, vocab), jnp.float32)
    for g in range(num_groups):
        s, t = jax.lax.top_k(logp0 - diversity_strength * div, kg)
        # score bookkeeping uses the TRUE logp, not the penalised one
        true_s = jnp.take_along_axis(logp0, t, axis=1)
        seqs.append(t)
        scores.append(true_s)
        div = div + jax.nn.one_hot(t, vocab, dtype=jnp.float32).sum(axis=1)
    top_tokens = jnp.concatenate(seqs, axis=1)  # [B, K] grouped layout
    live_scores = jnp.concatenate(scores, axis=1)

    live_seqs = jnp.full((b, num_beams, l), pad_token_id, jnp.int32)
    live_seqs = live_seqs.at[:, :, 0].set(top_tokens)
    eos0 = top_tokens == eos_token_id
    finished_scores = jnp.where(eos0, live_scores, NEG_INF)
    live_scores = jnp.where(eos0, NEG_INF, live_scores)

    state = BeamState(
        step=jnp.ones((), jnp.int32),
        live_seqs=live_seqs,
        live_scores=live_scores,
        finished_seqs=live_seqs,
        finished_scores=finished_scores,
        finished_flags=eos0,
        cache=init_cache,
    )

    def cond(state):
        return jnp.logical_and(
            state.step < l, ~jnp.all(state.finished_flags)
        )

    def body(state):
        step = state.step
        prev_tokens = jax.lax.dynamic_slice_in_dim(state.live_seqs, step - 1, 1, axis=2)
        flat_tokens = prev_tokens.reshape(b * num_beams, 1)
        positions = (prompt_lengths[:, None] + step - 1).repeat(num_beams, axis=0).reshape(-1, 1)
        logits, new_cache = decode_fn(flat_tokens, positions, state.cache)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(
            b, num_beams, vocab
        )

        div = jnp.zeros((b, vocab), jnp.float32)
        new_live_seqs = state.live_seqs
        new_live_scores = state.live_scores
        fin_seqs, fin_scores, fin_flags = (
            state.finished_seqs, state.finished_scores, state.finished_flags
        )
        beam_sel = jnp.zeros((b, num_beams), jnp.int32)
        for g in range(num_groups):
            sl = slice(g * kg, (g + 1) * kg)
            g_scores = state.live_scores[:, sl]          # [B, kg]
            g_logp = logp[:, sl]                         # [B, kg, V]
            cand = g_scores[:, :, None] + g_logp - diversity_strength * div[:, None, :]
            true_cand = g_scores[:, :, None] + g_logp
            flat = cand.reshape(b, kg * vocab)
            _, idx = jax.lax.top_k(flat, 2 * kg)
            cand_beam = idx // vocab
            cand_token = idx % vocab
            cand_scores = jnp.take_along_axis(
                true_cand.reshape(b, kg * vocab), idx, axis=1
            )
            g_seqs = jnp.take_along_axis(
                state.live_seqs[:, sl], cand_beam[:, :, None], axis=1
            )
            g_seqs = jax.lax.dynamic_update_slice_in_dim(
                g_seqs, cand_token[:, :, None].astype(jnp.int32), step, axis=2
            )
            is_eos = cand_token == eos_token_id

            gen_len = (step + 1).astype(jnp.float32)
            f_cand = jnp.where(is_eos, cand_scores / (gen_len ** length_penalty), NEG_INF)
            all_f_seqs = jnp.concatenate([fin_seqs[:, sl], g_seqs], axis=1)
            all_f_scores = jnp.concatenate([fin_scores[:, sl], f_cand], axis=1)
            all_f_flags = jnp.concatenate([fin_flags[:, sl], is_eos], axis=1)
            tf_scores, tf_idx = jax.lax.top_k(all_f_scores, kg)
            fin_seqs = fin_seqs.at[:, sl].set(
                jnp.take_along_axis(all_f_seqs, tf_idx[:, :, None], axis=1)
            )
            fin_scores = fin_scores.at[:, sl].set(tf_scores)
            fin_flags = fin_flags.at[:, sl].set(
                jnp.take_along_axis(all_f_flags, tf_idx, axis=1)
            )

            live_cand = jnp.where(is_eos, NEG_INF, cand_scores)
            nl_scores, live_idx = jax.lax.top_k(live_cand, kg)
            nl_seqs = jnp.take_along_axis(g_seqs, live_idx[:, :, None], axis=1)
            nl_beam = jnp.take_along_axis(cand_beam, live_idx, axis=1) + g * kg
            new_live_seqs = new_live_seqs.at[:, sl].set(nl_seqs)
            new_live_scores = new_live_scores.at[:, sl].set(nl_scores)
            beam_sel = beam_sel.at[:, sl].set(nl_beam)
            # count every token this group just committed to its live set
            chosen = jnp.take_along_axis(cand_token, live_idx, axis=1)
            div = div + jax.nn.one_hot(chosen, vocab, dtype=jnp.float32).sum(axis=1)

        new_cache = _gather_beams(new_cache, beam_sel, b, num_beams)
        return state.replace(
            step=step + 1,
            live_seqs=new_live_seqs,
            live_scores=new_live_scores,
            finished_seqs=fin_seqs,
            finished_scores=fin_scores,
            finished_flags=fin_flags,
            cache=new_cache,
        )

    state = jax.lax.while_loop(cond, body, state)

    # HF finalize: live beams compete with the finished pool (see the
    # matching note in beam_search)
    gen_len_final = jnp.maximum(state.step.astype(jnp.float32), 1.0)
    final_live = state.live_scores / (gen_len_final**length_penalty)
    all_seqs = jnp.concatenate([state.finished_seqs, state.live_seqs], axis=1)
    all_scores = jnp.concatenate([state.finished_scores, final_live], axis=1)
    scores, order = jax.lax.top_k(all_scores, num_beams)
    return jnp.take_along_axis(all_seqs, order[:, :, None], axis=1), scores
