"""Weight-only quantized decode: int8 (per-channel) / int4-g128 (packed).

Builds a small AVSR system, converts the LLaMA trunk with
`AVSRSystem.enable_quantized_decode`, and beam-decodes a synthetic batch —
the same one-dispatch jitted pipeline serving uses.  On the 3B trunk this
halves (int8) or quarters (int4) the per-token HBM weight reads that bound
decode; the dequantization runs in VMEM inside the fused Pallas matmuls
(multimodalvc_tpu/ops/int8_matmul.py).

Reference analog: NF4 4-bit serving via bitsandbytes (src/model.py:231-238).
Run full-size against the real checkpoints with `bench.py --int8 / --int4`.
"""
import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from multimodalvc_tpu.models.avsr import AVSRConfig, AVSRSystem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["int8", "int4"], default="int8")
    ap.add_argument("--beams", type=int, default=3)
    args = ap.parse_args()

    cfg = AVSRConfig.tiny()
    if args.mode == "int4":
        # int4-g128 needs every dense d_in % 256 == 0
        cfg.llama = dataclasses.replace(
            cfg.llama, hidden_size=256, intermediate_size=512,
            num_heads=4, num_kv_heads=2, head_dim=64,
        )
    system = AVSRSystem(cfg)

    rng = np.random.default_rng(0)
    b, t_v = 2, cfg.max_video_frames
    batch = {
        "audio_feats": jnp.asarray(
            rng.standard_normal((b, cfg.whisper.n_mels, 2 * cfg.whisper.max_frames)).astype(np.float32)
        ),
        "video": jnp.asarray(rng.standard_normal((b, t_v, 24, 24, 1)).astype(np.float32)),
        "video_lengths": jnp.asarray([t_v] * b, dtype=jnp.int32),
        "instruction": jnp.asarray(rng.integers(1, 200, (b, 5))),
        "labels": jnp.asarray(rng.integers(1, 200, (b, 4))),
        "label_lengths": jnp.asarray([4] * b, dtype=jnp.int32),
    }
    variables = system.init(jax.random.PRNGKey(0), batch)

    qvars = system.enable_quantized_decode(dict(variables), mode=args.mode)
    seqs, scores = system.generate(qvars, batch, num_beams=args.beams, max_new_tokens=8)
    print(f"{args.mode} beam-{args.beams} decode ok:",
          np.asarray(seqs)[:, 0].tolist(), np.asarray(scores)[:, 0].tolist())


if __name__ == "__main__":
    main()
