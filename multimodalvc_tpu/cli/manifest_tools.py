"""Manifest tooling: generate / split / count-hours / normalize-rates.

Reference analogs: src/germanManifest-generator.py (parallel tsv+wrd
builder with frames/samples/speech-rate), src/splitDataset.py,
src/countHours.py, manifest/germanManifest/normalize_rates.py,
manifest/update_dataset_paths.py.
"""
from __future__ import annotations

import argparse
import functools
import glob
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _clip_metadata(video_path: str, text_dir_name: Optional[str], video_dir_name: str):
    """(tsv_line, transcript) for one clip; None on failure."""
    from scipy.io import wavfile

    wav_path = os.path.splitext(video_path)[0] + ".wav"
    if not os.path.exists(wav_path):
        return None
    sr, data = wavfile.read(wav_path)  # header+data; scipy lacks info-only
    n_aud = data.shape[0]
    if video_path.endswith(".npy"):
        n_vid = int(np.load(video_path, mmap_mode="r").shape[0])
    else:
        import cv2

        cap = cv2.VideoCapture(video_path)
        n_vid = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
    text = ""
    if text_dir_name:
        txt_path = video_path.replace(video_dir_name, text_dir_name)
        txt_path = os.path.splitext(txt_path)[0] + ".txt"
        if not os.path.exists(txt_path):
            return None
        with open(txt_path, encoding="utf-8") as f:
            text = f.read().strip().lower()
        if not text:
            return None
    duration = n_aud / 16000.0
    rate = round(len(text.split()) / duration, 2) if (text and duration > 0) else 0.0
    line = f"dataset\t{video_path}\t{wav_path}\t{n_vid}\t{n_aud}\t{rate}"
    return line, text


def cmd_generate(args):
    video_root = os.path.join(args.root, args.video_dir)
    patterns = ("*.mp4", "*.npy")
    files: List[str] = []
    for p in patterns:
        files += glob.glob(os.path.join(video_root, "**", p), recursive=True)
    files.sort()
    print(f"processing {len(files)} clips with {args.workers} workers")
    with ThreadPoolExecutor(args.workers) as pool:
        results = list(
            pool.map(lambda f: _clip_metadata(f, args.text_dir, args.video_dir), files)
        )
    valid = [r for r in results if r is not None]
    with open(args.out_tsv, "w", encoding="utf-8") as f:
        f.write("/\n")
        for line, _ in valid:
            f.write(line + "\n")
    if args.text_dir:
        with open(os.path.splitext(args.out_tsv)[0] + ".wrd", "w", encoding="utf-8") as f:
            for _, text in valid:
                f.write(text + "\n")
    print(f"wrote {len(valid)} entries -> {args.out_tsv}")


def cmd_split(args):
    """Split a tsv(+wrd) into train/valid/test (src/splitDataset.py:4-93)."""
    with open(args.tsv) as f:
        root = f.readline()
        rows = f.readlines()
    wrd_path = os.path.splitext(args.tsv)[0] + ".wrd"
    labels = None
    if os.path.exists(wrd_path):
        with open(wrd_path) as f:
            labels = f.readlines()
    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(rows))
    n_valid = int(len(rows) * args.valid_frac)
    n_test = int(len(rows) * args.test_frac)
    splits = {
        "valid": order[:n_valid],
        "test": order[n_valid : n_valid + n_test],
        "train": order[n_valid + n_test :],
    }
    for name, idx in splits.items():
        with open(os.path.join(args.out_dir, f"{name}.tsv"), "w") as f:
            f.write(root)
            for i in sorted(idx):
                f.write(rows[i])
        if labels:
            with open(os.path.join(args.out_dir, f"{name}.wrd"), "w") as f:
                for i in sorted(idx):
                    f.write(labels[i])
        print(f"{name}: {len(idx)}")


def cmd_hours(args):
    """Total audio hours in a manifest (src/countHours.py:1-39)."""
    total = 0
    with open(args.tsv) as f:
        f.readline()
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 5:
                total += int(parts[4])
    secs = total / 16000.0
    print(f"total samples: {total}\ntotal seconds: {secs:.2f}\ntotal hours: {secs / 3600:.2f}")


def cmd_normalize_rates(args):
    """Clamp/standardize the speech-rate column to a target band
    (manifest/germanManifest/normalize_rates.py)."""
    with open(args.tsv) as f:
        root = f.readline()
        rows = [ln.rstrip("\n").split("\t") for ln in f]
    rates = np.asarray([float(r[5]) if len(r) > 5 and r[5] else 0.0 for r in rows])
    valid = rates > 0
    mean = rates[valid].mean() if valid.any() else 1.0
    # map absolute words/sec onto the SR predictor's [1, 2] factor band
    norm = np.clip(rates / max(mean, 1e-6), args.min_rate, args.max_rate)
    out = args.out or args.tsv
    with open(out, "w") as f:
        f.write(root)
        for r, nr in zip(rows, norm):
            r = r[:5] + [f"{nr:.2f}"]
            f.write("\t".join(r) + "\n")
    print(f"normalized {len(rows)} rates (mean raw={mean:.2f}) -> {out}")


def cmd_update_paths(args):
    """Rewrite a path prefix in manifests (manifest/update_dataset_paths.py)."""
    with open(args.tsv) as f:
        content = f.read()
    content = content.replace(args.old, args.new)
    with open(args.out or args.tsv, "w") as f:
        f.write(content)
    print("updated paths")


def _mel_one(task):
    """Extract one wav's 128-band 100 Hz log-mel target next to the wav
    (reference: src/generateLogMel-Spectrograms.py:1-132, librosa n_fft=1024
    hop=160 fmax=8000 center=False reflect-pad natural-log clamp 1e-5)."""
    import numpy as np

    from ..data.audio import hifigan_mel_np, read_wav

    wav_path, overwrite = task
    out_path = os.path.splitext(wav_path)[0] + "_mel_100hz_128bands.npy"
    if os.path.exists(out_path) and not overwrite:
        return 0
    try:
        mel = hifigan_mel_np(read_wav(wav_path))  # [T, 128]
        np.save(out_path, mel.astype(np.float32))
        return 1
    except Exception as e:  # unreadable wav — skip, report
        logger.warning("%s: %s", wav_path, e)
        return 0


def cmd_generate_mels(args):
    """Offline mel-target extraction over a manifest, multiprocessing Pool
    with SLURM CPU detection like the reference (:96-110)."""
    from multiprocessing import Pool

    wavs = []
    with open(args.tsv) as f:
        root = f.readline().strip()
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 3:
                continue
            audio = cols[2].split(":")[0]
            wavs.append(audio if os.path.isabs(audio) else os.path.join(root, audio))
    workers = args.workers or int(
        os.environ.get("SLURM_CPUS_PER_TASK", os.cpu_count() or 1)
    )
    tasks = [(w, args.overwrite) for w in sorted(set(wavs))]
    if workers <= 1:
        done = sum(_mel_one(t) for t in tasks)
    else:
        with Pool(workers) as pool:
            done = sum(pool.map(_mel_one, tasks, chunksize=16))
    print(f"wrote {done}/{len(tasks)} mel targets")


def cmd_make_babble(args):
    """Mix N random manifest utterances into a babble-noise track
    (reference: avhubert/preparation/lrs3_noise.py mix_audio — overlap-add
    of 30 normalised utterances)."""
    from ..data.audio import read_wav, write_wav

    wavs = []
    with open(args.tsv) as f:
        root = f.readline().strip()
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) >= 3:
                a = cols[2].split(":")[0]
                wavs.append(a if os.path.isabs(a) else os.path.join(root, a))
    rng = np.random.default_rng(args.seed)
    pick = rng.choice(len(wavs), size=min(args.n, len(wavs)), replace=False)
    tracks = [read_wav(wavs[i]) for i in pick]
    t = max(len(w) for w in tracks)
    mix = np.zeros(t, np.float32)
    for w in tracks:
        reps = int(np.ceil(t / len(w)))
        tiled = np.tile(w, reps)[:t]
        mix += tiled / max(np.abs(tiled).max(), 1e-6)
    mix = mix / max(np.abs(mix).max(), 1e-6) * 0.95
    write_wav(args.out, mix)
    print(f"mixed {len(tracks)} utterances -> {args.out} ({t / 16000:.1f} s)")


def cmd_filter_language(args):
    """Filter manifest rows by a clip-id -> language metadata CSV
    (reference: src/germanDatasetExtraction.py — VoxCeleb2 rows with
    language == 'de' selected from the metadata dump; ids are matched as
    substrings of the clip's video path, e.g. 'id00017/abc123')."""
    lang_ids = set()
    with open(args.meta) as f:
        header = f.readline().rstrip("\n").split(",")
        id_col = header.index(args.id_column)
        lang_col = header.index(args.language_column)
        for line in f:
            cols = line.rstrip("\n").split(",")
            if len(cols) > max(id_col, lang_col) and cols[lang_col].strip() == args.language:
                lang_ids.add(cols[id_col].strip())
    kept, total = 0, 0
    wrd_in = open(args.wrd) if args.wrd else None
    wrd_out = open(args.out + ".wrd", "w") if args.wrd else None
    with open(args.tsv) as f, open(args.out, "w") as out:
        out.write(f.readline())
        for line in f:
            total += 1
            label = wrd_in.readline() if wrd_in else None
            video = line.split("\t")[1] if "\t" in line else ""
            if any(cid in video for cid in lang_ids):
                out.write(line)
                if wrd_out is not None and label is not None:
                    wrd_out.write(label)
                kept += 1
    if wrd_in:
        wrd_in.close()
        wrd_out.close()
    print(f"kept {kept}/{total} clips with language={args.language}")


def cmd_align_mouth(args):
    """Landmark-driven mouth-ROI extraction for one clip
    (avhubert/preparation/align_mouth.py analog): video .npy [T, H, W] +
    landmarks .npy [T, 68, 2] -> ROI .npy [T, 2*ch, 2*cw]."""
    from ..data.roi import crop_mouth_rois, default_mean_face, detect_landmarks

    frames = np.load(args.video)
    if args.landmarks:
        lms = np.load(args.landmarks)
        landmarks = [lm if np.isfinite(lm).all() else None for lm in lms]
    else:
        # on-the-fly detection (reference: detect_landmark.py stage) — needs
        # mediapipe or dlib; precomputed --landmarks stays the offline path
        landmarks = detect_landmarks(frames, backend=args.detector or None)
    mean_face = (
        np.load(args.mean_face) if args.mean_face else default_mean_face(args.std_size)
    )
    rois = crop_mouth_rois(
        frames,
        landmarks,
        mean_face,
        std_size=args.std_size,
        window_margin=args.window_margin,
        crop_height=args.crop // 2,
        crop_width=args.crop // 2,
    )
    if rois is None:
        raise SystemExit("no valid landmarks in clip")
    np.save(args.out, rois)
    print(f"wrote {rois.shape} -> {args.out}")


def _read_feature_dump(prefix: str):
    """Read a dump-features output: {prefix}.npy [sum_T, D] + {prefix}.len
    (per-clip frame counts, one per manifest row)."""
    feats = np.load(prefix + ".npy")
    with open(prefix + ".len") as f:
        lens = [int(x) for x in f.read().split()]
    if sum(lens) != len(feats):
        raise ValueError(
            f"{prefix}.len sums to {sum(lens)} but {prefix}.npy has {len(feats)} rows"
        )
    return feats, lens


def cmd_dump_features(args):
    """Extract intermediate AV-HuBERT activations over a manifest for
    iteration-2+ k-means labels (avhubert/clustering/dump_hubert_feature.py
    analog — HubertFeatureReader.get_feats with mask=False; --layer 0 dumps
    the fused frontend features, the reference's ret_conv=True).  Writes
    {out}.npy (concatenated [sum_T, D]) + {out}.len (per-clip frame counts),
    the same two-file format the reference's NpyAppendArray dump uses."""
    import jax
    import jax.numpy as jnp

    from ..models import (  # noqa: F401 — registers model classes
        avhubert_pretrain as _avh_pre,
        avsr as _avsr,
    )
    from ..config.registry import get_class, get_config_class
    from ..data.audio import read_wav, stacked_logfbank_np
    from ..data.manifest import load_manifest
    from ..data.video import load_video_frames, transform_video
    from ..runtime.checkpoint import CheckpointManager

    model_cfg_cls = get_config_class("model", args.model)
    model_cfg = (
        getattr(model_cfg_cls, args.preset)() if args.preset else model_cfg_cls()
    )
    system = get_class("model", args.model).from_config(model_cfg)

    manifest = load_manifest(args.tsv, max_keep_frames=args.max_frames)

    def clip_arrays(e):
        root = manifest.root
        vp = e.video_path if os.path.isabs(e.video_path) else os.path.join(root, e.video_path)
        ap = e.audio_path if os.path.isabs(e.audio_path) else os.path.join(root, e.audio_path)
        video = transform_video(
            load_video_frames(vp), crop_size=args.crop_size, train=False
        )
        audio = stacked_logfbank_np(read_wav(ap))
        t = min(len(video), len(audio))
        return video[:t], audio[:t], t

    # init from the first clip, then restore trained params
    v0, a0, t0 = clip_arrays(manifest.entries[0])
    dummy = dict(
        audio=jnp.asarray(a0[None]),
        video=jnp.asarray(v0[None]),
        targets=jnp.zeros((1, t0), jnp.int32),
        lengths=jnp.asarray([t0], jnp.int32),
    )
    variables = system.module.init(jax.random.PRNGKey(0), train=False, **dummy)
    template = {
        "params": variables["params"],
        "collections": {k: v for k, v in variables.items() if k != "params"},
    }
    ckpt = CheckpointManager(args.ckpt)
    restored = ckpt.restore(template, name=args.ckpt_name)
    if restored is None:
        raise FileNotFoundError(f"no {args.ckpt_name} under {args.ckpt}")
    model_vars = {"params": restored["params"], **restored["collections"]}

    @functools.partial(jax.jit, static_argnames=("layer",))
    def extract(model_vars, audio, video, lengths, layer):
        return system.module.apply(
            model_vars, audio=audio, video=video,
            targets=jnp.zeros(audio.shape[:2], jnp.int32), lengths=lengths,
            train=False, output_layer=layer,
        )

    feats, lens = [], []
    for e in manifest.entries:
        video, audio, t = clip_arrays(e)
        # pad to a multiple of 32 frames so XLA reuses a few compiled programs
        tp = ((t + 31) // 32) * 32
        video = np.pad(video, ((0, tp - t),) + ((0, 0),) * (video.ndim - 1))
        audio = np.pad(audio, ((0, tp - t), (0, 0)))
        h = extract(
            model_vars, jnp.asarray(audio[None]), jnp.asarray(video[None]),
            jnp.asarray([t], jnp.int32), args.layer,
        )
        feats.append(np.asarray(h[0, :t], np.float32))
        lens.append(t)
    out = np.concatenate(feats, axis=0)
    np.save(args.out + ".npy", out)
    with open(args.out + ".len", "w") as f:
        f.write("\n".join(map(str, lens)) + "\n")
    print(
        f"dumped layer-{args.layer} features for {len(lens)} clips "
        f"({out.shape[0]} frames x {out.shape[1]}) -> {args.out}.npy/.len"
    )


def cmd_learn_kmeans(args):
    """Fit mini-batch k-means and save centroids (reference:
    avhubert/clustering/{dump_mfcc_feature,learn_kmeans}.py).  Features are
    MFCCs computed from --tsv (iteration 1) or a dump-features output via
    --features (iteration 2+, model activations)."""
    from ..data.audio import read_wav
    from ..data.clustering import MiniBatchKMeans, mfcc_np

    if args.features:
        all_feats, _ = _read_feature_dump(args.features)
    else:
        feats = []
        with open(args.tsv) as f:
            root = f.readline().strip()
            for line in f:
                cols = line.rstrip("\n").split("\t")
                if len(cols) < 3:
                    continue
                audio = cols[2].split(":")[0]
                path = audio if os.path.isabs(audio) else os.path.join(root, audio)
                feats.append(mfcc_np(read_wav(path)))
        all_feats = np.concatenate(feats, axis=0)
    if 0 < args.percent < 1.0:
        rng = np.random.default_rng(0)
        keep = rng.choice(len(all_feats), int(len(all_feats) * args.percent), replace=False)
        all_feats = all_feats[keep]
    km = MiniBatchKMeans(args.clusters, batch_size=args.batch_size).fit(
        all_feats, epochs=args.epochs
    )
    km.save(args.out)
    print(f"fit {args.clusters} clusters on {len(all_feats)} frames -> {args.out}")


def cmd_dump_labels(args):
    """Write per-clip k-means labels (.km) for pretraining
    (avhubert/clustering/dump_km_label.py analog).  With --features, labels
    come from dumped model activations (iteration 2+) instead of MFCCs."""
    from ..data.clustering import MiniBatchKMeans, dump_labels_for_manifest

    km = MiniBatchKMeans.load(args.centroids)
    if args.features:
        feats, lens = _read_feature_dump(args.features)
        labels = km.predict(feats)
        n, off = 0, 0
        with open(args.out, "w") as out:
            for t in lens:
                out.write(" ".join(map(str, labels[off : off + t].tolist())) + "\n")
                off += t
                n += 1
    else:
        n = dump_labels_for_manifest(args.tsv, km, args.out)
    print(f"wrote {n} label rows -> {args.out}")


def main():
    from ._platform import apply_platform_env

    apply_platform_env()

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    bb = sub.add_parser("make-babble", help="mix manifest utterances into babble noise")
    bb.add_argument("--tsv", required=True)
    bb.add_argument("--n", type=int, default=30)
    bb.add_argument("--seed", type=int, default=0)
    bb.add_argument("--out", required=True)
    bb.set_defaults(fn=cmd_make_babble)

    fl = sub.add_parser("filter-language", help="filter manifest by language metadata CSV")
    fl.add_argument("--tsv", required=True)
    fl.add_argument("--wrd", default=None, help="matching transcript file to co-filter")
    fl.add_argument("--meta", required=True, help="CSV with clip ids + language")
    fl.add_argument("--language", default="de")
    fl.add_argument("--id-column", default="id")
    fl.add_argument("--language-column", default="language")
    fl.add_argument("--out", required=True)
    fl.set_defaults(fn=cmd_filter_language)

    am = sub.add_parser("align-mouth", help="landmark-aligned mouth-ROI crop")
    am.add_argument("--video", required=True, help=".npy [T, H, W]")
    am.add_argument(
        "--landmarks", default=None,
        help=".npy [T, 68, 2]; NaN rows = missed. Omit to detect on the fly "
        "(mediapipe/dlib)",
    )
    am.add_argument(
        "--detector", default=None, choices=("mediapipe", "dlib"),
        help="landmark backend when --landmarks is omitted (default: auto)",
    )
    am.add_argument("--mean-face", default=None, help=".npy [68, 2]")
    am.add_argument("--std-size", type=int, default=256)
    am.add_argument("--window-margin", type=int, default=12)
    am.add_argument("--crop", type=int, default=96)
    am.add_argument("--out", required=True)
    am.set_defaults(fn=cmd_align_mouth)

    df = sub.add_parser(
        "dump-features",
        help="dump intermediate AV-HuBERT activations for iteration-2 k-means",
    )
    df.add_argument("--tsv", required=True)
    df.add_argument("--ckpt", required=True, help="checkpoint save_dir")
    df.add_argument("--ckpt-name", default="checkpoint_last")
    df.add_argument("--model", default="av_hubert_pretrain")
    df.add_argument("--preset", default=None, help="model config preset (e.g. tiny)")
    df.add_argument("--layer", type=int, default=12,
                    help="encoder layer (1-indexed); 0 = frontend features")
    df.add_argument("--max-frames", type=int, default=500)
    df.add_argument("--crop-size", type=int, default=88)
    df.add_argument("--out", required=True, help="output prefix ({out}.npy/.len)")
    df.set_defaults(fn=cmd_dump_features)

    kk = sub.add_parser("learn-kmeans", help="fit k-means on MFCCs for pretraining labels")
    kk.add_argument("--tsv", default=None)
    kk.add_argument("--features", default=None,
                    help="dump-features prefix (iteration-2 model activations)")
    kk.add_argument("--clusters", type=int, default=500)
    kk.add_argument("--epochs", type=int, default=5)
    kk.add_argument("--batch-size", type=int, default=10000)
    kk.add_argument("--percent", type=float, default=1.0)
    kk.add_argument("--out", required=True)
    kk.set_defaults(fn=cmd_learn_kmeans)

    kl = sub.add_parser("dump-labels", help="write per-clip k-means labels (.km)")
    kl.add_argument("--tsv", default=None)
    kl.add_argument("--features", default=None,
                    help="dump-features prefix (iteration-2 model activations)")
    kl.add_argument("--centroids", required=True)
    kl.add_argument("--out", required=True)
    kl.set_defaults(fn=cmd_dump_labels)

    m = sub.add_parser("generate-mels", help="offline 128-band mel targets")
    m.add_argument("--tsv", required=True)
    m.add_argument("--workers", type=int, default=0)
    m.add_argument("--overwrite", action="store_true")
    m.set_defaults(fn=cmd_generate_mels)

    g = sub.add_parser("generate")
    g.add_argument("--root", required=True)
    g.add_argument("--video-dir", default="video")
    g.add_argument("--text-dir", default=None)
    g.add_argument("--out-tsv", required=True)
    g.add_argument("--workers", type=int, default=8)
    g.set_defaults(fn=cmd_generate)

    s = sub.add_parser("split")
    s.add_argument("--tsv", required=True)
    s.add_argument("--out-dir", required=True)
    s.add_argument("--valid-frac", type=float, default=0.05)
    s.add_argument("--test-frac", type=float, default=0.05)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_split)

    h = sub.add_parser("hours")
    h.add_argument("--tsv", required=True)
    h.set_defaults(fn=cmd_hours)

    n = sub.add_parser("normalize-rates")
    n.add_argument("--tsv", required=True)
    n.add_argument("--out", default=None)
    n.add_argument("--min-rate", type=float, default=1.0)
    n.add_argument("--max-rate", type=float, default=2.0)
    n.set_defaults(fn=cmd_normalize_rates)

    u = sub.add_parser("update-paths")
    u.add_argument("--tsv", required=True)
    u.add_argument("--old", required=True)
    u.add_argument("--new", required=True)
    u.add_argument("--out", default=None)
    u.set_defaults(fn=cmd_update_paths)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
