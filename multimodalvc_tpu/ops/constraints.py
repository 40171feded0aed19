"""Lexically-constrained decoding state machines as static-shape JAX.

TPU-native analog of fairseq's constraint tracking
(fairseq/fairseq/token_generation_constraints.py): the reference keeps a
Python trie per beam and advances it with per-token Python calls inside the
generation loop — host-side control flow that would sync the accelerator
every step.  Here the trie is flattened once (host-side) into fixed-shape
arrays and the per-beam state is a small integer pytree, so `advance`,
`bank`, `finished` and the candidate enumeration are all jittable and run
inside the decode `lax.while_loop` with zero host round-trips.

Semantics are kept exactly fairseq's:

 * ``pack_constraints`` — the packed [B, maxlen] tensor format
   (token_generation_constraints.py:41-93).
 * unordered: a trie (ConstraintNode, :111-200) with per-beam
   generated/completed counters and the advance/rewind rules of
   UnorderedConstraintState (:202-359) including edge saturation
   (``generated[child] < child.num_constraints``).
 * ordered: the flattened ConstraintSequence (:361-384) with
   OrderedConstraintState's 5-way advance (:387-506).

The search strategy built on these lives in ``ops.beam_search.
constrained_beam_search`` (reference: fairseq/fairseq/search.py:433-814).
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Packing (host-side, numpy) — fairseq's exact tensor format
# ---------------------------------------------------------------------------


def pack_constraints(batch_constraints: Sequence[Sequence[Sequence[int]]]) -> np.ndarray:
    """Pack per-sentence constraint lists into fairseq's [B, maxlen] layout:
    row = [num_constraints, c0..., 0, c1..., 0, ...] zero-padded
    (token_generation_constraints.py:41-93)."""
    max_len = 1
    for sent in batch_constraints:
        if len(sent):
            max_len = max(max_len, 1 + sum(len(c) for c in sent) + len(sent))
    out = np.zeros((len(batch_constraints), max_len), np.int64)
    for i, sent in enumerate(batch_constraints):
        out[i, 0] = len(sent)
        off = 1
        for c in sent:
            out[i, off : off + len(c)] = np.asarray(c, np.int64)
            off += len(c) + 1
    return out


def unpack_constraints(row: np.ndarray) -> List[List[int]]:
    """Inverse of ``pack_constraints`` for one row
    (token_generation_constraints.py:94-108)."""
    row = [int(x) for x in row]
    n, off, out = row[0], 1, []
    for _ in range(n):
        end = row.index(0, off)
        out.append(row[off:end])
        off = end + 1
    return out


# ---------------------------------------------------------------------------
# Unordered constraints: flattened trie + counter state
# ---------------------------------------------------------------------------


class TrieArrays(NamedTuple):
    """One flattened constraint trie per batch row, padded to a common node
    count.  Node 0 is the root (token -1).  Each non-root node has exactly
    one parent edge, so the (parent, token) pairs ARE the edge table."""

    token: jnp.ndarray  # [B, N] int32, node's incoming-edge token (-1 at root/pad)
    parent: jnp.ndarray  # [B, N] int32 (0 at root/pad)
    terminal: jnp.ndarray  # [B, N] int32, #constraints ending exactly here
    num_constraints: jnp.ndarray  # [B, N] int32, #constraints through this node
    node_valid: jnp.ndarray  # [B, N] bool (False for padding and root)
    num_constraint_tokens: jnp.ndarray  # [B] int32 (sum of token_counts)
    max_depth: int  # static bound for the rewind walk


class UnorderedState(NamedTuple):
    """Per-beam trie progress (UnorderedConstraintState analog).  Leaves are
    [..., N]-shaped so the whole thing vmaps/gathers along beam axes."""

    node: jnp.ndarray  # [...] int32 current node (0 = root)
    generated: jnp.ndarray  # [..., N] int32
    completed: jnp.ndarray  # [..., N] int32


def build_unordered(packed: np.ndarray) -> TrieArrays:
    """Flatten each row's constraint trie (host-side)."""
    b = packed.shape[0]
    rows = [unpack_constraints(packed[i]) for i in range(b)]
    tries = []
    max_nodes, max_depth = 1, 1
    for sent in rows:
        # nodes: list of dicts; node 0 = root
        nodes = [dict(token=-1, parent=0, terminal=0, num=0, children={})]
        for seq in sent:
            cur = 0
            for tok in seq:
                kids = nodes[cur]["children"]
                if tok not in kids:
                    nodes.append(dict(token=tok, parent=cur, terminal=0, num=0, children={}))
                    kids[tok] = len(nodes) - 1
                cur = kids[tok]
            nodes[cur]["terminal"] += 1
            # bump num_constraints up the path (root included)
            while True:
                nodes[cur]["num"] += 1
                if cur == 0:
                    break
                cur = nodes[cur]["parent"]
            max_depth = max(max_depth, len(seq))
        tries.append(nodes)
        max_nodes = max(max_nodes, len(nodes))

    def arr(key, fill):
        out = np.full((b, max_nodes), fill, np.int32)
        for i, nodes in enumerate(tries):
            out[i, : len(nodes)] = [n[key] for n in nodes]
        return out

    valid = np.zeros((b, max_nodes), bool)
    for i, nodes in enumerate(tries):
        valid[i, 1 : len(nodes)] = True
    n_tokens = np.asarray(
        [sum(n["num"] for n in nodes[1:]) for nodes in tries], np.int32
    )
    return TrieArrays(
        token=jnp.asarray(arr("token", -1)),
        parent=jnp.asarray(arr("parent", 0)),
        terminal=jnp.asarray(arr("terminal", 0)),
        num_constraints=jnp.asarray(arr("num", 0)),
        node_valid=jnp.asarray(valid),
        num_constraint_tokens=jnp.asarray(n_tokens),
        max_depth=max_depth,
    )


def unordered_init(trie: TrieArrays, beams: int) -> UnorderedState:
    b, n = trie.token.shape
    return UnorderedState(
        node=jnp.zeros((b, beams), jnp.int32),
        generated=jnp.zeros((b, beams, n), jnp.int32),
        completed=jnp.zeros((b, beams, n), jnp.int32),
    )


def _child(trie_row: TrieArrays, node, tok) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(child index, found) of edge node --tok-->; single-row trie."""
    match = trie_row.node_valid & (trie_row.parent == node) & (trie_row.token == tok)
    found = jnp.any(match)
    idx = jnp.argmax(match).astype(jnp.int32)
    return idx, found


def _rewind(trie_row: TrieArrays, node, generated, completed):
    """Walk old-state node -> root: first unsaturated terminal ancestor gets
    completed += 1 (and the walk stops); every node passed before that gets
    generated -= 1 (UnorderedConstraintState.advance's rewind(), :326-340)."""

    def body(_, carry):
        cur, gen, comp, done = carry
        at_root = cur == 0
        active = jnp.logical_not(done | at_root)
        is_term = (trie_row.terminal[cur] > 0) & (comp[cur] < trie_row.terminal[cur])
        comp = comp.at[cur].add(jnp.where(active & is_term, 1, 0))
        gen = gen.at[cur].add(jnp.where(active & ~is_term, -1, 0))
        done = done | (active & is_term)
        nxt = jnp.where(active & ~is_term, trie_row.parent[cur], cur)
        return nxt, gen, comp, done

    cur, gen, comp, _ = jax.lax.fori_loop(
        0,
        trie_row.max_depth + 1,
        body,
        (node, generated, completed, jnp.zeros((), bool)),
    )
    return gen, comp


def unordered_advance(trie_row: TrieArrays, node, generated, completed, tok):
    """One-beam advance (UnorderedConstraintState.advance, :298-359)."""
    child, c_found = _child(trie_row, node, tok)
    can_child = c_found & (generated[child] < trie_row.num_constraints[child])
    rchild, r_found = _child(trie_row, jnp.zeros((), jnp.int32), tok)
    root_unsat = generated[rchild] < trie_row.num_constraints[rchild]

    # case 1: matching unsaturated child — descend, no rewind
    # case 2: token restarts from the root (saturation decides root vs child)
    # case 3: fall off entirely — back to root
    take_child = can_child
    take_rchild = ~can_child & r_found & root_unsat
    to_root = ~can_child & ~take_rchild

    new_node = jnp.where(
        take_child, child, jnp.where(take_rchild, rchild, jnp.zeros((), jnp.int32))
    )
    gen = generated.at[new_node].add(
        jnp.where(take_child | take_rchild, 1, 0)
    )  # __init__ marks non-root nodes generated (:225-227)
    # rewind bookkeeping runs whenever we fell off the current path (cases 2+3)
    r_gen, r_comp = _rewind(trie_row, node, gen, completed)
    gen = jnp.where(take_child, gen, r_gen)
    comp = jnp.where(take_child, completed, r_comp)
    return new_node, gen, comp


def unordered_bank(generated) -> jnp.ndarray:
    return generated.sum(-1)


def unordered_num_completed(trie_row: TrieArrays, node, completed) -> jnp.ndarray:
    in_final = (trie_row.terminal[node] > 0) & (
        completed[node] < trie_row.terminal[node]
    )
    return completed.sum(-1) + in_final.astype(jnp.int32)


def unordered_finished(trie_row: TrieArrays, node, completed) -> jnp.ndarray:
    total = trie_row.num_constraints[0]
    return total - unordered_num_completed(trie_row, node, completed) == 0


def unordered_next_tokens(trie_row: TrieArrays, node):
    """Candidate tokens = children of the root plus (off-root) children of the
    current node (UnorderedConstraintState.next_tokens, :287-296).  Returns
    ([N] tokens, [N] valid) aligned with the node table (node j's incoming
    token is a candidate iff j's parent is the root or the current node)."""
    is_cand = trie_row.node_valid & (
        (trie_row.parent == 0) | (trie_row.parent == node)
    )
    return trie_row.token, is_cand


# ---------------------------------------------------------------------------
# Ordered constraints: flattened sequence + index state
# ---------------------------------------------------------------------------


class SequenceArrays(NamedTuple):
    """ConstraintSequence per batch row (:361-384): all constraints
    concatenated, with endpoint flags at each constraint's last token."""

    seq: jnp.ndarray  # [B, M] int32 (-1 padding)
    endpoints: jnp.ndarray  # [B, M] bool
    length: jnp.ndarray  # [B] int32
    num_constraint_tokens: jnp.ndarray  # [B] int32 (== length)
    max_depth: int  # unused; symmetry with TrieArrays


def build_ordered(packed: np.ndarray) -> SequenceArrays:
    b = packed.shape[0]
    rows = [unpack_constraints(packed[i]) for i in range(b)]
    m = max(1, max((sum(len(c) for c in sent) for sent in rows), default=1))
    seq = np.full((b, m), -1, np.int32)
    ends = np.zeros((b, m), bool)
    lens = np.zeros((b,), np.int32)
    for i, sent in enumerate(rows):
        off = 0
        for c in sent:
            seq[i, off : off + len(c)] = c
            ends[i, off + len(c) - 1] = True
            off += len(c)
        lens[i] = off
    return SequenceArrays(
        seq=jnp.asarray(seq),
        endpoints=jnp.asarray(ends),
        length=jnp.asarray(lens),
        num_constraint_tokens=jnp.asarray(lens),
        max_depth=1,
    )


def ordered_init(seqs: SequenceArrays, beams: int) -> jnp.ndarray:
    """State is just the index of the last fulfilled token (-1 = root)."""
    return jnp.full((seqs.seq.shape[0], beams), -1, jnp.int32)


def ordered_advance(seq_row: SequenceArrays, state, tok):
    """OrderedConstraintState.advance's 5-way branch (:470-506)."""
    length = seq_row.length
    finished = state + 1 >= length
    nxt = seq_row.seq[jnp.clip(state + 1, 0, seq_row.seq.shape[0] - 1)]
    at_end = seq_row.endpoints[jnp.clip(state, 0, seq_row.seq.shape[0] - 1)] & (
        state >= 0
    )
    first = seq_row.seq[0]
    return jnp.where(
        finished,
        state,
        jnp.where(
            nxt == tok,
            state + 1,
            jnp.where(at_end, state, jnp.where(tok == first, 0, -1)),
        ),
    ).astype(jnp.int32)


def ordered_bank(state) -> jnp.ndarray:
    return state + 1


def ordered_num_completed(seq_row: SequenceArrays, state) -> jnp.ndarray:
    idx = jnp.arange(seq_row.endpoints.shape[0])
    return (seq_row.endpoints & (idx <= state)).sum().astype(jnp.int32)


def ordered_finished(seq_row: SequenceArrays, state) -> jnp.ndarray:
    return state + 1 >= seq_row.length


def ordered_next_tokens(seq_row: SequenceArrays, state):
    """{seq[0] if state > 0} plus {seq[state+1] if unfinished}
    (OrderedConstraintState.next_tokens, :448-459).  Returns ([2], [2])."""
    m = seq_row.seq.shape[0]
    first = seq_row.seq[0]
    nxt = seq_row.seq[jnp.clip(state + 1, 0, m - 1)]
    toks = jnp.stack([first, nxt])
    valid = jnp.stack([state > 0, ~ordered_finished(seq_row, state)])
    return toks, valid
