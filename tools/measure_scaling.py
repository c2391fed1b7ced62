"""Scaling measurement (VERDICT r2 task 6): wall-clock, not prose.

Three measurements, each in its own subprocess so JAX platform/device
flags apply cleanly:

  1. virtual-mesh: encode_batch at mesh (1,) vs (4,2) on an 8-device
     virtual CPU mesh (XLA_FORCE_HOST_PLATFORM_DEVICE_COUNT=8).  NB this
     host has os.cpu_count() physical cores; 8 virtual devices timeshare
     them, so this measures *sharding overhead*, not speedup — the honest
     claim is "the sharded program is not slower than the replicated one
     beyond straggler noise".
  2. multihost: the 2-process jax.distributed path (same one
     tests/test_multihost.py proves byte-parity for), timed per process
     over its image shard vs one process over the whole set.
  3. real chip (optional, AEJ_SCALING_TPU=1): single-chip encode_batch
     with and without mesh=(1,)-Mesh wrapping — sanity that the mesh path
     adds no overhead on real hardware.

Writes results/scaling.md.  Reference analog: the reference has no
distributed runtime at all (SURVEY §2.3) — its scaling mechanism is one
process per image (test/analysis/metrics_computation.py:253-255).
"""

import json
import os
import subprocess
import sys
import textwrap

REPO = "/root/repo"
PY = sys.executable

WORKER = textwrap.dedent("""
    import glob, json, os, sys, time
    import numpy as np
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")

    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.config import CodecConfig
    from aejpeg_tpu.io.image import ImageData
    import imageio.v3 as iio

    mode = sys.argv[1]          # "flat" | "mesh"
    batch = int(sys.argv[2])
    iters = int(sys.argv[3])

    LIVE = ("/root/reference/test_images/"
            "LIVE_image_quality_assessment_database")
    paths = sorted(glob.glob(f"{LIVE}/*.bmp"))
    imgs = []
    for p in paths:
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(ImageData(im.astype(np.float32) / 255.0,
                                  im.shape, ".bmp"))
        if len(imgs) == 8:
            break
    images = (imgs * ((batch + 7) // 8))[:batch]
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64), entropy_level=-1)

    mesh = None
    if mode == "mesh":
        from jax.sharding import Mesh
        devs = np.asarray(jax.devices()).reshape(4, 2)
        mesh = Mesh(devs, ("data", "model"))

    blobs = encode_batch(images, cfg, mesh=mesh)        # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        blobs = encode_batch(images, cfg, mesh=mesh)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"mode": mode, "batch": batch, "sec_per_batch": dt,
                      "nbytes": sum(len(x) for x in blobs)}))
""")

MH_WORKER = textwrap.dedent("""
    import glob, json, os, sys, time
    import numpy as np
    sys.path.insert(0, "/root/repo")
    import jax
    jax.config.update("jax_platforms", "cpu")

    nproc = int(sys.argv[1]); pid = int(sys.argv[2])
    port = sys.argv[3]; batch = int(sys.argv[4]); iters = int(sys.argv[5])
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                                   num_processes=nproc, process_id=pid)

    from aejpeg_tpu.codec.batch_encode import encode_batch
    from aejpeg_tpu.config import CodecConfig
    from aejpeg_tpu.io.image import ImageData
    from aejpeg_tpu.parallel import multihost as mh
    import imageio.v3 as iio

    LIVE = ("/root/reference/test_images/"
            "LIVE_image_quality_assessment_database")
    paths = sorted(glob.glob(f"{LIVE}/*.bmp"))
    imgs = []
    for p in paths:
        im = iio.imread(p)
        if im.shape == (512, 768, 3):
            imgs.append(ImageData(im.astype(np.float32) / 255.0,
                                  im.shape, ".bmp"))
        if len(imgs) == 8:
            break
    images = (imgs * ((batch + 7) // 8))[:batch]
    cfg = CodecConfig("YCoCg", (20, 80), (4, 64), entropy_level=-1)
    sl = mh.process_shard(len(images), nproc, pid)
    mine = images[sl]

    blobs = encode_batch(mine, cfg)                      # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        blobs = encode_batch(mine, cfg)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"pid": pid, "nproc": nproc, "n_images": len(mine),
                      "sec_per_batch": dt}))
""")


def run_virtual(mode, batch, iters=3):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8")
    out = subprocess.run([PY, "-c", WORKER, mode, str(batch), str(iters)],
                         capture_output=True, text=True, env=env,
                         cwd=REPO, timeout=3600)
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"virtual {mode} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_multihost(nproc, batch, iters=3):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    port = "29817"
    procs = [subprocess.Popen(
        [PY, "-c", MH_WORKER, str(nproc), str(pid), port,
         str(batch), str(iters)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=REPO) for pid in range(nproc)]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=3600)
        if p.returncode != 0:
            print(se[-2000:], file=sys.stderr)
            raise RuntimeError("multihost worker failed")
        outs.append(json.loads(so.strip().splitlines()[-1]))
    return outs


def main():
    batch = int(os.environ.get("AEJ_SCALING_BATCH", 16))
    ncpu = os.cpu_count()
    print(f"host cores: {ncpu}", flush=True)

    flat = run_virtual("flat", batch)
    meshr = run_virtual("mesh", batch)
    print("virtual:", flat, meshr, flush=True)
    assert flat["nbytes"] == meshr["nbytes"], "mesh output diverged"

    one = run_multihost(1, batch)
    two = run_multihost(2, batch)
    print("multihost:", one, two, flush=True)
    t1 = one[0]["sec_per_batch"]
    t2 = max(r["sec_per_batch"] for r in two)
    eff = t1 / (2 * t2)

    lines = [
        "# Scaling measurements (round 5 refresh)",
        "",
        f"Host: {ncpu} physical cores; JAX CPU backend; LIVE 512x768",
        f"images, YCoCg q20-80 blocks 4-64, batch {batch}, mean of 3.",
        "",
        "## Virtual 8-device mesh (sharding overhead)",
        "",
        "8 virtual devices timeshare the physical cores, so a speedup is",
        "impossible by construction; this measures what the (4,2)-mesh",
        "`shard_map` program COSTS over the single-device program on",
        "byte-identical output.",
        "",
        "| path | sec/batch | vs flat |",
        "|---|---|---|",
        f"| single-device | {flat['sec_per_batch']:.3f} | 1.00x |",
        (f"| mesh (4,2) | {meshr['sec_per_batch']:.3f} | "
         f"{meshr['sec_per_batch'] / flat['sec_per_batch']:.2f}x |"),
        "",
        f"Output bytes identical: {flat['nbytes']} = {meshr['nbytes']}.",
        "",
        "## Multi-host (2-process jax.distributed, DCN-style)",
        "",
        "Pure data parallelism; no collectives cross process boundaries",
        "(parallel/multihost.py).  Efficiency = t_1proc / (2 * t_2proc).",
        "",
        "| procs | images/proc | sec/batch (max over procs) |",
        "|---|---|---|",
        f"| 1 | {one[0]['n_images']} | {t1:.3f} |",
        f"| 2 | {two[0]['n_images']} | {t2:.3f} |",
        "",
        f"**Scaling efficiency at 2 processes: {eff * 100:.1f}%**",
        "(>=85% BASELINE target; both processes share this host's",
        f"{ncpu} cores, so true 2-host efficiency - which adds no such",
        "contention - is bounded BELOW by this number for the device",
        "stages; host entropy stages contend for the same cores here.)",
        "",
    ]
    os.makedirs(f"{REPO}/results", exist_ok=True)
    with open(f"{REPO}/results/scaling.md", "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
