"""Long-horizon convergence run with an FID-class quality curve.

The reference demonstrates convergence on its cat dataset
(tabby2tortie_demo.png; TB events under model_instances/model/train/),
but that data is unreachable here — data/*.dvc are pointer stubs and the
gdrive remote needs network. This run substitutes a *structured*
synthetic translation task whose optimum is known: two domains share
shape geometry and differ by a fixed palette/texture mapping, so a
correct CycleGAN drives the FID-class distance between stylized-A and
real-B toward the real-real floor.

Emits one JSONL line per evaluation round:
  {"step": N, "epoch": E, "a2b_fid_proxy": ..., "b2a_fid_proxy": ...,
   "a2b_swd": ..., "wall_s": ...}
plus a "floor" line measuring real-vs-real (the attainable minimum) and
a "start" line for the untrained model. Defaults: ~10k optimizer steps
on the default recipe (configs/cycle.yaml), bf16 + NHCW kernel pack.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/convergence_run.py \
      [--steps 10000] [--out docs/quality/convergence_r02.jsonl]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SIZE = 256


def _draw_shapes(rng, palette, n):
    """n images of random ellipses/rects; colors from `palette` (a
    callable base->rgb mapping) on a shared background texture style."""
    imgs = np.zeros((n, SIZE, SIZE, 3), np.uint8)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE]
    for i in range(n):
        # textured background: low-frequency sinusoid mix
        fx, fy = rng.uniform(0.01, 0.04, 2)
        phase = rng.uniform(0, 6.28)
        base = 0.5 + 0.25 * np.sin(fx * xx + fy * yy + phase)
        img = np.stack([base, base, base], -1)
        img = img * palette("bg", rng)[None, None, :]
        for _ in range(rng.integers(3, 7)):
            cx, cy = rng.uniform(32, SIZE - 32, 2)
            rx, ry = rng.uniform(12, 48, 2)
            ang = rng.uniform(0, 3.14)
            ca, sa = np.cos(ang), np.sin(ang)
            u = (xx - cx) * ca + (yy - cy) * sa
            v = -(xx - cx) * sa + (yy - cy) * ca
            if rng.random() < 0.5:
                mask = (u / rx) ** 2 + (v / ry) ** 2 < 1.0
            else:
                mask = (np.abs(u) < rx) & (np.abs(v) < ry)
            color = palette("fg", rng)
            shade = 0.75 + 0.25 * base[mask]
            img[mask] = shade[:, None] * color[None, :]
        imgs[i] = np.clip(img * 255, 0, 255).astype(np.uint8)
    return imgs


def _palette_a(kind, rng):
    # domain A: cool — teal/blue foregrounds on green-grey backgrounds
    if kind == "bg":
        return np.array([0.35, 0.45, 0.40])
    return np.array([rng.uniform(0.0, 0.2), rng.uniform(0.5, 0.9),
                     rng.uniform(0.7, 1.0)])


def _palette_b(kind, rng):
    # domain B: warm — orange/red foregrounds on brown backgrounds
    if kind == "bg":
        return np.array([0.45, 0.40, 0.30])
    return np.array([rng.uniform(0.7, 1.0), rng.uniform(0.3, 0.6),
                     rng.uniform(0.0, 0.2)])


def _to_uint8(pred):
    return np.clip((np.asarray(pred, np.float32) + 1.0) * 127.5,
                   0, 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--eval-rounds", type=int, default=12)
    ap.add_argument("--n-train", type=int, default=192)
    ap.add_argument("--n-eval", type=int, default=96)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="docs/quality/convergence_r02.jsonl")
    ap.add_argument("--workdir", default="/tmp/converge")
    ap.add_argument("--no-tpu-layout", action="store_true")
    args = ap.parse_args()

    from cyclegan_tpu.config import Namespace, yaml2namespace
    from cyclegan_tpu.data.pipeline import ArrayDataset
    from cyclegan_tpu.trainer import CycleGan
    from cyclegan_tpu.utils.quality import compute_quality

    rng = np.random.default_rng(0)
    train_a = _draw_shapes(rng, _palette_a, args.n_train)
    train_b = _draw_shapes(rng, _palette_b, args.n_train)
    eval_a = _draw_shapes(rng, _palette_a, args.n_eval)
    eval_b = _draw_shapes(rng, _palette_b, args.n_eval)
    # independent draw from B for the real-vs-real floor
    floor_b = _draw_shapes(rng, _palette_b, args.n_eval)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    log = open(out, "a")

    def emit(rec):
        rec["ts"] = round(time.time(), 1)
        log.write(json.dumps(rec) + "\n")
        log.flush()
        print(json.dumps(rec), flush=True)

    floor = compute_quality(floor_b, eval_b)
    emit({"kind": "floor", **{f"b_vs_b_{k}": v for k, v in floor.items()}})

    model_config = yaml2namespace("configs/cycle.yaml")
    model_config.name = "converge"
    model_config.location = str(Path(args.workdir) / "models")
    model_config.new = True

    steps_per_epoch = args.n_train // args.batch
    total_epochs = max(1, args.steps // steps_per_epoch)
    epochs_per_round = max(1, total_epochs // args.eval_rounds)

    train_config = Namespace(dict(
        epochs=epochs_per_round,
        batch_size=args.batch,
        image_size=SIZE,
        compute_dtype="bfloat16",
        tpu_layout=not args.no_tpu_layout,
        display_every=0,
        summary=dict(samples=2, images=10 ** 9, model=10 ** 9),
        g_opt=dict(name="adam", learning_rate=2e-4, beta_1=0.5),
        d_opt=dict(name="adam", learning_rate=2e-4, beta_1=0.5),
    ))

    gan = CycleGan(model_config, train_config)
    train_ds = ArrayDataset(train_a, train_b, shuffle=True, seed=0)
    val_ds = ArrayDataset(eval_a[:32], eval_b[:32], shuffle=False)

    def evaluate(step, epoch, wall):
        fake_b = np.concatenate(
            [_to_uint8(gan.predict(eval_a[i:i + args.batch], "a2b"))
             for i in range(0, len(eval_a), args.batch)])
        fake_a = np.concatenate(
            [_to_uint8(gan.predict(eval_b[i:i + args.batch], "b2a"))
             for i in range(0, len(eval_b), args.batch)])
        qa = compute_quality(fake_b, eval_b)
        qb = compute_quality(fake_a, eval_a)
        emit({"kind": "eval", "step": step, "epoch": epoch,
              "wall_s": round(wall, 1),
              **{f"a2b_{k}": v for k, v in qa.items()
                 if k not in ("n_a", "n_b")},
              **{f"b2a_{k}": v for k, v in qb.items()
                 if k not in ("n_a", "n_b")}})

    t0 = time.time()
    evaluate(0, 0, 0.0)
    done_epochs = 0
    while done_epochs < total_epochs:
        gan.train(train_ds, val_ds)
        done_epochs += epochs_per_round
        evaluate(done_epochs * steps_per_epoch, done_epochs,
                 time.time() - t0)
    emit({"kind": "done", "total_steps": done_epochs * steps_per_epoch,
          "wall_s": round(time.time() - t0, 1)})


if __name__ == "__main__":
    main()
