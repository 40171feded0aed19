"""Lexically-constrained transcription (fairseq --constraints analog).

Forces the beam decode to emit given token phrases — 'unordered' lets the
constraints appear in any order (trie state machine), 'ordered' requires
their given order (flattened sequence).  Both run as static-shape state
machines inside the decode `lax.while_loop`
(multimodalvc_tpu/ops/constraints.py + ops/beam_search.py
constrained_beam_search), step-parity-tested against fairseq's own
LexicallyConstrainedBeamSearch (fairseq/fairseq/search.py:433-814).

Three surfaces:
  * the product system: `AVSRSystem.generate(constraints=[[phrase_tokens,
    ...], ...], constraints_mode=...)` — per-batch-row phrase lists, packed
    host-side; and the eval CLI via `generation.constraints_file=<path>`
    (line N = tab-separated phrases for manifest sample N, fairseq-cli
    --constraints semantics) + `generation.constraints=unordered|ordered`
  * the raw LLaMA decode: `generate_beam(..., constraints=...)`
  * the legacy seq2seq generator: `generate_seq2seq(..., constraints=...)`
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.nn.llama import LlamaConfig, LlamaModel, generate_beam
from multimodalvc_tpu.ops import constraints as C


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["unordered", "ordered"], default="unordered")
    ap.add_argument("--beams", type=int, default=4)
    args = ap.parse_args()

    cfg = LlamaConfig.tiny()
    cfg.lora = None
    model = LlamaModel(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        inputs_embeds=jnp.zeros((1, 4, 64), jnp.float32),
        attn_mask=jnp.ones((1, 4), jnp.int32),
    )
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((2, 7, 64)) * 0.05, jnp.float32)
    mask = jnp.ones((2, 7), jnp.int32)

    # per-row constraint phrases (token ids); row 0 must say "17 18" and "9",
    # row 1 must say "40 41 42"
    packed = C.pack_constraints([[[17, 18], [9]], [[40, 41, 42]]])
    build = C.build_unordered if args.mode == "unordered" else C.build_ordered
    seqs, scores = generate_beam(
        model, variables, emb, mask,
        eos_token_id=2, pad_token_id=0, num_beams=args.beams,
        max_new_tokens=12, cache_dtype=jnp.float32,
        constraints=build(packed), constraints_mode=args.mode,
    )
    for i, row in enumerate(np.asarray(seqs)[:, 0]):
        print(f"row {i} best beam: {row.tolist()}  (score {float(scores[i, 0]):.3f})")


if __name__ == "__main__":
    main()
