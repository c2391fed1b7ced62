"""Metric-parity validation without piq (VERDICT r1 task 6).

The reference's "better than JPEG" machinery compares sweep results against
a hardcoded standard-JPEG anchor table computed with piq over the LIVE
database (/root/reference/test/analysis/metrics_comparison.py:28-34).
piq/torchvision weights are unavailable here, so instead we REPRODUCE the
anchors end-to-end: cv2-JPEG-encode every LIVE image at q in
{10,25,50,75,90}, measure PSNR/SSIM/MS-SSIM with aejpeg_tpu.metrics and
CR vs raw RGB bytes, and compare the dataset means against the table.
Agreement within ~1% validates our piq-semantics claims (PSNR on RGB
floats range 1.0, SSIM on cv2-grayscale uint8 range 255, MS-SSIM on RGB
floats) through the exact pipeline the anchors came from.

Writes results/metric_parity.md.  Run with JAX_PLATFORMS=cpu (no TPU
needed; metrics are small convs).
"""

import glob
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import cv2 as cv

from aejpeg_tpu.metrics.quality import EvaluationMetrics

LIVE = "/root/reference/test_images/LIVE_image_quality_assessment_database"
ANCHORS = {
    10: dict(psnr=25.6922, ssim=0.8877, ms_ssim=0.9014, cr=26.3875),
    25: dict(psnr=28.7196, ssim=0.9572, ms_ssim=0.9569, cr=15.4089),
    50: dict(psnr=30.8579, ssim=0.9797, ms_ssim=0.9759, cr=10.4945),
    75: dict(psnr=33.1062, ssim=0.9901, ms_ssim=0.9855, cr=7.3001),
    90: dict(psnr=36.3888, ssim=0.9964, ms_ssim=0.9925, cr=4.5639),
}


def main():
    paths = sorted(glob.glob(f"{LIVE}/*.bmp"))
    assert paths, LIVE
    rows = []
    for q in (10, 25, 50, 75, 90):
        ps, ss, ms, crs = [], [], [], []
        for p in paths:
            img = cv.cvtColor(cv.imread(p), cv.COLOR_BGR2RGB)
            ok, enc = cv.imencode(".jpg", cv.cvtColor(img, cv.COLOR_RGB2BGR),
                                  [cv.IMWRITE_JPEG_QUALITY, q])
            assert ok
            dec = cv.cvtColor(cv.imdecode(enc, cv.IMREAD_COLOR),
                              cv.COLOR_BGR2RGB)
            a = img.astype(np.float32) / 255.0
            b = dec.astype(np.float32) / 255.0
            m = EvaluationMetrics(a, b)
            ps.append(m.psnr())
            ss.append(m.ssim())
            ms.append(m.ms_ssim())
            crs.append(img.nbytes / len(enc))
        rows.append((q, float(np.mean(ps)), float(np.mean(ss)),
                     float(np.mean(ms)), float(np.mean(crs))))
        print(f"q={q}: psnr={rows[-1][1]:.4f} ssim={rows[-1][2]:.4f} "
              f"ms_ssim={rows[-1][3]:.4f} cr={rows[-1][4]:.4f}", flush=True)

    os.makedirs("results", exist_ok=True)
    lines = [
        "# Metric parity vs the reference's standard-JPEG anchors",
        "",
        "Reproduction of the piq-computed anchor table",
        "(`/root/reference/test/analysis/metrics_comparison.py:28-34`) with",
        "`aejpeg_tpu.metrics` over the LIVE database"
        f" ({len(paths)} images), cv2 JPEG at fixed quality.",
        "LPIPS is omitted: its AlexNet weights are unobtainable in this",
        "environment (zero egress; see metrics/lpips.py).",
        "",
        "| q | PSNR ours | PSNR ref | Δ% | SSIM ours | SSIM ref | Δ% |"
        " MS-SSIM ours | MS-SSIM ref | Δ% | CR ours | CR ref | Δ% |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    worst = 0.0
    for q, p_, s_, m_, c_ in rows:
        a = ANCHORS[q]
        dp = 100 * (p_ - a["psnr"]) / a["psnr"]
        ds = 100 * (s_ - a["ssim"]) / a["ssim"]
        dm = 100 * (m_ - a["ms_ssim"]) / a["ms_ssim"]
        dc = 100 * (c_ - a["cr"]) / a["cr"]
        worst = max(worst, abs(dp), abs(ds), abs(dm))
        lines.append(
            f"| {q} | {p_:.4f} | {a['psnr']:.4f} | {dp:+.2f} "
            f"| {s_:.4f} | {a['ssim']:.4f} | {ds:+.2f} "
            f"| {m_:.4f} | {a['ms_ssim']:.4f} | {dm:+.2f} "
            f"| {c_:.4f} | {a['cr']:.4f} | {dc:+.2f} |")
    lines += [
        "",
        f"Worst quality-metric deviation: {worst:.2f}% "
        "(CR depends on the JPEG encoder build and is reported for "
        "context only).",
        "",
    ]
    with open("results/metric_parity.md", "w") as f:
        f.write("\n".join(lines))
    print(f"worst quality-metric deviation: {worst:.2f}%")
    print("wrote results/metric_parity.md")


if __name__ == "__main__":
    main()
