"""Summarize a quality-run log (quality_detcorpus_r2.py / *_r1gamma_ab.py)
into a markdown trajectory table: per-validation PSNR/SSIM, best epochs,
collapse detection (>2 dB drop from running best), and the TEST_AGG line.

Usage: python quality_report.py <log> [<log> ...]
"""
import re
import sys


def parse(path):
    epoch = None
    stage = 1
    rows = []  # (stage, epoch, psnr, ssim)
    test_agg = None
    pend_psnr = None
    for line in open(path, errors="replace"):
        m = re.match(r"Epoch (\d+)/(\d+)", line)
        if m:
            e, tot = int(m.group(1)), int(m.group(2))
            if epoch is not None and e < epoch:
                stage += 1
            epoch = e
        m = re.match(r"PSNR: ([\d.]+)", line)
        if m:
            pend_psnr = float(m.group(1))
        m = re.match(r"SSIM: ([-\d.]+)", line)
        if m and pend_psnr is not None:
            rows.append((stage, epoch, pend_psnr, float(m.group(1))))
            pend_psnr = None
        if line.startswith("TEST_AGG"):
            test_agg = line.strip()
    return rows, test_agg


for path in sys.argv[1:]:
    rows, test_agg = parse(path)
    print(f"\n## {path}\n")
    print("| stage | epoch | val PSNR (dB) | val SSIM |")
    print("|---|---|---|---|")
    best = {}
    running_best = {}
    for s, e, p, q in rows:
        flag = ""
        rb = running_best.get(s, -1e9)
        if p < rb - 2.0:
            flag = "  <- collapse?"
        running_best[s] = max(rb, p)
        if s not in best or p > best[s][1]:
            best[s] = (e, p, q)
        print(f"| {s} | {e} | {p:.2f}{flag} | {q:.4f} |")
    for s, (e, p, q) in sorted(best.items()):
        print(f"\nstage {s} best: PSNR {p:.2f} dB / SSIM {q:.4f} (epoch {e})")
    if test_agg:
        print(f"\n{test_agg}")
