"""Capture a jax.profiler device trace of the train step and print the
per-op time attribution (top fusions/custom-calls, grouped).

Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/trace_step.py \
        --pack [--out /tmp/trace_pack]   # the shipped bench.py path

``--pack`` = NHCW + full kernel pack; the per-family flags
(--pallas-conv etc.) exist for ablation traces only.

Parses the TensorBoard trace (trace.json.gz) directly -- no TensorBoard
needed. Groups XLA ops by their HLO-name prefix so conv / pallas-kernel /
fusion / transpose / reduce time is attributed separately.
"""

import argparse
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.config import yaml2namespace
from cyclegan_tpu.models import create_model
from cyclegan_tpu.optimizers import get_optimizer
from cyclegan_tpu.steps import init_train_state, make_train_step

BATCH, SIZE = 8, 256


def build(tpu_layout: bool, model_config_path: str = "configs/cycle.yaml",
          batch: int = BATCH, fuse_apps: bool = False,
          image_size: int = SIZE):
    model_config = yaml2namespace(model_config_path)
    train_config = yaml2namespace("configs/training_config.yaml")
    models = {
        "g_AB": create_model(model_config.generator),
        "g_BA": create_model(model_config.generator),
        "d_A": create_model(model_config.discriminator),
        "d_B": create_model(model_config.discriminator),
    }
    optimizers = {
        k: get_optimizer(train_config.g_opt if k.startswith("g")
                         else train_config.d_opt)
        for k in models
    }
    state = init_train_state(jax.random.PRNGKey(0), models, optimizers)
    train = make_train_step(models, optimizers, model_config.loss,
                            dict(model_config.loss_weights), donate=False,
                            compute_dtype="bfloat16",
                            tpu_layout=tpu_layout, fuse_apps=fuse_apps)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (batch, image_size, image_size, 3))
                    ).astype(jnp.bfloat16)
    return train, state, x


CATEGORY_GROUPS = {
    # authoritative when the trace carries args.hlo_category
    "custom-call": "pallas-kernel",
    "convolution": "conv",
    "transpose": "transpose",
    "copy": "copy/reshape",
    "reshape": "copy/reshape",
    "bitcast": "copy/reshape",
    "all-reduce": "collective",
    "reduce-window": "reduce-window(pool)",
    "reduce": "reduce",
}


def group_key(name: str, category: str = "") -> str:
    """Collapse an HLO op name to an attribution bucket.

    Backward-pass ops carry jax's autodiff naming wrappers
    (``transpose_jvp___<core>``, ``jvp__<core>``) — strip them first, or
    every backward op (including Pallas custom-calls) lands in a bogus
    "transpose" bucket and pallas-kernel reads zero.
    """
    cat = category.lower().strip()
    if cat in CATEGORY_GROUPS:
        return CATEGORY_GROUPS[cat]
    if cat == "fusion":
        return "fusion(elementwise)"
    n = name.lower()
    # Wrappers nest (e.g. ``transpose_jvp_transpose_jvp_jvp______``): keep
    # stripping until none match, or backward Pallas custom-calls land in a
    # bogus "transpose" bucket. Leading underscores are NOT stripped — the
    # kernel_fns patterns below start with '_' and substring matching
    # already tolerates leftover wrapper underscores.
    stripped = True
    while stripped:
        stripped = False
        for pref in ("transpose_jvp_", "jvp_"):
            if n.startswith(pref):
                n = n[len(pref):]
                stripped = True
    kernel_fns = ("_conv_kernel", "_dw_kernel", "_conv1x1_kernel",
                  "_dw1x1_kernel", "_fwd_kernel", "_bwd_kernel",
                  "_sum2x2", "_dup2x2", "_concat_kernel", "_norm_act")
    if any(k in n for k in kernel_fns):
        # Pallas kernels show up under their kernel-function names
        return "pallas-kernel"
    if "custom-call" in n or "pallas" in n or "tpu_custom_call" in n:
        return "pallas-kernel"
    if "convolution" in n or "conv" in n:
        return "conv"
    if "all-reduce" in n or "psum" in n:
        return "collective"
    if "transpose" in n:
        return "transpose"
    if "reduce-window" in n:
        return "reduce-window(pool)"
    if "reduce" in n:
        return "reduce"
    if "scatter" in n or "gather" in n or "dynamic" in n:
        return "gather/scatter/dyn"
    if "copy" in n or "bitcast" in n or "reshape" in n:
        return "copy/reshape"
    if "fusion" in n:
        return "fusion(elementwise)"
    return "other"


def main():
    from cyclegan_tpu.utils.platform import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--nhcw", action="store_true")
    ap.add_argument("--pack", action="store_true",
                    help="bench.py defaults: --nhcw + the whole kernel "
                    "pack (conv/resize/norm-act/concat). Tracing with "
                    "only --pallas-conv attributes XLA fallbacks for "
                    "the other families, which is NOT the shipped path.")
    ap.add_argument("--pallas-conv", action="store_true")
    ap.add_argument("--pallas-resize", action="store_true")
    ap.add_argument("--pallas-norm-act", action="store_true")
    ap.add_argument("--pallas-concat", action="store_true")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--model_config", default="configs/cycle.yaml",
                    help="trace a different recipe (e.g. "
                    "configs/unet_patchgan.yaml, configs/resnet.yaml)")
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--image-size", type=int, default=SIZE,
                    help="trace at a different resolution (e.g. 512 for "
                    "the high-res training attribution)")
    ap.add_argument("--fuse-apps", action="store_true",
                    help="batch the two generators' independent applies "
                    "(the resnet recipe's shipped default)")
    ap.add_argument("--out", default="/tmp/trace_step")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; re-parse the newest trace under "
                    "--out (steps must match the captured run)")
    args = ap.parse_args()

    if args.parse_only:
        parse_and_print(args)
        return

    if args.pack:
        from cyclegan_tpu.ops import enable_kernel_pack

        args.nhcw = True
        enable_kernel_pack(True)

    if args.pallas_conv:
        from cyclegan_tpu.ops import pallas_conv

        pallas_conv.enable(True)

    if args.pallas_resize:
        from cyclegan_tpu.ops import pallas_resize

        pallas_resize.enable(True)

    if args.pallas_norm_act:
        from cyclegan_tpu.ops import pallas_norm_act

        pallas_norm_act.enable(True)

    if args.pallas_concat:
        from cyclegan_tpu.ops import pallas_concat

        pallas_concat.enable(True)

    train, state, x = build(args.nhcw, args.model_config, args.batch,
                            args.fuse_apps, args.image_size)

    # warm up (compile) outside the trace
    s = state
    for _ in range(3):
        s, m = train(s, x, x)
    _ = float(m["gAB_loss"])

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        s, m = train(s, x, x)
    _ = float(m["gAB_loss"])
    jax.profiler.stop_trace()
    time.sleep(2)

    parse_and_print(args)


def parse_and_print(args):
    traces = sorted(glob.glob(
        args.out + "/**/*.trace.json.gz", recursive=True))
    if not traces:
        print("NO TRACE FILES under", args.out)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # Use ONLY the device "XLA Ops" lane: the trace also carries "Steps"
    # and "XLA Modules" lanes whose events span whole steps — summing all
    # lanes triple-counts device time.
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", "")
            )
    device_pids = {p for p, n in pid_names.items()
                   if "tpu" in n.lower() or "device" in n.lower()
                   or "xla" in n.lower()}
    op_lanes = {k for k, n in tid_names.items() if n == "XLA Ops"}

    by_group = collections.Counter()
    by_name = collections.Counter()
    by_source = collections.Counter()
    by_cross = collections.Counter()  # (source, group) pairs
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        if op_lanes and (e.get("pid"), e.get("tid")) not in op_lanes:
            continue
        name = e.get("name", "")
        dur = e["dur"]
        # skip the enclosing module/program events (they span everything)
        if dur > 1e6 or name.startswith(("jit_", "pjit")):
            continue
        category = e.get("args", {}).get("hlo_category", "")
        group = group_key(name, category)
        by_group[group] += dur
        # Same wrapper-stripping as group_key so backward ops don't all
        # collapse into one "transpose_jvp___" row.
        core = name
        while True:
            for pref in ("transpose_jvp_", "jvp_", "_"):
                if core.startswith(pref) and len(core) > len(pref):
                    core = core[len(pref):]
                    break
            else:
                break
        by_name[core.split(".")[0] or "<unnamed>"] += dur
        src = e.get("args", {}).get("source", "?")
        by_source[src] += dur
        by_cross[(src, group)] += dur
        total += dur

    n = max(args.steps, 1)
    print(f"device pids: {sorted(device_pids)} "
          f"({ {p: pid_names.get(p) for p in device_pids} })")
    print(f"total device op time: {total/1e3:.1f} ms "
          f"({total/1e3/n:.2f} ms/step over {n} steps)\n")
    print("== by group (ms/step) ==")
    for g, d in by_group.most_common():
        print(f"  {g:24s} {d/1e3/n:8.2f}  ({100*d/max(total,1):4.1f}%)")
    print("\n== top 25 op prefixes (ms/step) ==")
    for name, d in by_name.most_common(25):
        print(f"  {d/1e3/n:8.3f}  {name[:110]}")
    print("\n== top 20 sources (ms/step) ==")
    for src, d in by_source.most_common(20):
        print(f"  {d/1e3/n:8.3f}  {src[:100]}")
    print("\n== top 25 (source, group) pairs (ms/step) ==")
    for (src, g), d in by_cross.most_common(25):
        print(f"  {d/1e3/n:8.3f}  {g:22s} {src[:80]}")


if __name__ == "__main__":
    main()
