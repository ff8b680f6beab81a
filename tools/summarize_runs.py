"""Summarize matched-PSNR benchmark runs into a markdown table.

Parses the training logs and eval_psnr outputs produced by the runs/
measurement queue (reference vs this framework on the same scene and step
budget, BASELINE.md configs 2-3) and prints the results table.  Steady-
state rays/sec is the median over the last 80% of logged steps (skips
compile + shuffle warmup); PSNR comes from the ``mean_psnr=`` summary line.

Usage: python tools/summarize_runs.py [runs_dir]
"""

import re
import statistics
import sys


def train_stats(path):
    """(median steady rays/sec, final fine loss) from a train log."""
    rates, fines = [], []
    try:
        with open(path) as f:
            for ln in f:
                m = re.search(r"fine=([\d.e+-]+)", ln)
                r = re.search(r"rays_per_sec=([\d.e+-]+)", ln)
                if m and r:
                    fines.append(float(m.group(1)))
                    rates.append(float(r.group(1)))
    except FileNotFoundError:
        return None, None
    if not rates:
        return None, None
    steady = rates[len(rates) // 5 :]
    return statistics.median(steady), statistics.median(fines[-10:])


def log_backend(path):
    """'tpu' | 'cpu' | 'mixed' from a train log's own markers.

    Each process run prints a "loading dataset..." header; TPU-env runs
    additionally emit the axon plugin-registration warning, CPU-env runs
    (PALLAS_AXON_POOL_IPS=) never do.  A resumed log can therefore mix
    backends (e.g. chip segment + CPU resume after a relay outage) — the
    table must say so rather than present one median rate as one backend.
    """
    runs = axon = 0
    try:
        with open(path, errors="replace") as f:
            for ln in f:
                if ln.startswith("loading dataset"):
                    runs += 1
                if "Platform 'axon' is experimental" in ln:
                    axon += 1
    except FileNotFoundError:
        return None
    if runs == 0:
        return None
    if axon == 0:
        return "cpu"
    return "tpu" if axon >= runs else "mixed"


def mean_psnr(path):
    """(mean PSNR, mean SSIM or None) from an eval_psnr log."""
    p = s = None
    try:
        with open(path) as f:
            for ln in f:
                m = re.match(r"mean_psnr=([\d.]+)", ln)
                if m:
                    p = float(m.group(1))
                m = re.match(r"mean_ssim=([\d.]+)", ln)
                if m:
                    s = float(m.group(1))
    except FileNotFoundError:
        pass
    return p, s


def fmt(x, spec=",.0f"):
    return format(x, spec) if x is not None else "—"


def baked_frames(d):
    """Frame-timing table from the measure_baked logs (queue7 0.5x)."""
    import glob
    import os

    logs = sorted(glob.glob(f"{d}/measure_baked*.log"))
    rows = []
    for path in logs:
        name = os.path.basename(path)[:-4]
        with open(path) as f:
            for ln in f:
                m = re.match(
                    r"(\S+): ([\d.]+) s/frame \(([\d,]+) rays/s\), "
                    r"dropped (\d+)/(\d+)",
                    ln,
                )
                if m:
                    rows.append(
                        (name, m.group(1), float(m.group(2)), m.group(3))
                    )
                p = re.match(r"(\S+): PSNR vs live ([\d.]+|inf) dB", ln)
                if p and rows and rows[-1][1] == p.group(1) and len(rows[-1]) == 4:
                    # Tag must match the pending timing row: attaching by
                    # position alone can glue a PSNR onto the previous
                    # resolution (or the previous log) whenever a timing
                    # line fails the regex.
                    rows[-1] = rows[-1] + (float(p.group(2)),)
    if rows:
        print()
        print("| run | config | s/frame | rays/s | PSNR vs live |")
        print("|---|---|---|---|---|")
        for r in rows:
            psnr = f"{r[4]:.2f}" if len(r) > 4 else "—"
            print(f"| {r[0]} | {r[1]} | {r[2]:.3f} | {r[3]} | {psnr} |")


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "runs"
    rows = [
        ("reference vanilla (dense 64c+192f)", "ref_vanilla", "eval_ref_vanilla"),
        ("ours vanilla + occupancy", "ours_vanilla", "eval_ours_vanilla"),
        ("reference Instant-NGP (dense 64c+192f)", "ref_ngp", "eval_ref_ngp"),
        ("ours Instant-NGP + occupancy", "ours_ngp", "eval_ours_ngp"),
        ("ours Instant-NGP + occupancy, pooled train", "ours_ngp_pooled", None),
        ("ours NGP + occ, pooled, 8-step scan dispatch", "ours_ngp_scan8", None),
        (
            "ours NGP + occ, pooled, cosine lr",
            "ours_ngp_cosine",
            "eval_ours_ngp_cosine",
        ),
        (
            "blender-protocol converted scene (ours, occupancy)",
            "blender_e2e",
            "blender_e2e",
        ),
        ("reference Ref-NeRF (dense 64c+192f)", "ref_refnerf", "eval_ref_refnerf"),
        ("ours Ref-NeRF + occupancy", "ours_refnerf_1500", "eval_ours_refnerf_1500"),
        ("ours NGP x Ref-NeRF + occupancy", "ours_ngpref", "eval_ours_ngpref"),
        # (the reference NGPxRef baseline is device-bound only —
        # measure_ref_ngpref.log, surfaced by device_bound_rows below)
    ]
    print("| config | backend | rays/sec (end-to-end) | final fine MSE | "
          "test PSNR | SSIM |")
    print("|---|---|---|---|---|---|")
    import os

    def _variant(stem):
        # A queue item that ran on the CPU backend during a chip outage
        # writes <stem>_cpu.log; prefer the chip log when both exist.
        return stem if os.path.exists(f"{d}/{stem}.log") else f"{stem}_cpu"

    for label, train, ev in rows:
        train = _variant(train)
        rate, fine = train_stats(f"{d}/{train}.log")
        backend = log_backend(f"{d}/{train}.log") or "—"
        psnr, ssim = mean_psnr(f"{d}/{_variant(ev)}.log") if ev else (None, None)
        print(
            f"| {label} | {backend} | {fmt(rate)} | {fmt(fine, '.5f')} | "
            f"{fmt(psnr, '.2f')} | {fmt(ssim, '.4f')} |"
        )
    device_bound_rows(d)
    baked_frames(d)


def device_bound_rows(d):
    """Device-bound reference baselines from the measure_reference logs
    (single 'reference <tag>: ... rays/sec=N' line per run — the
    train_stats regexes cannot parse these)."""
    import glob

    rows = []
    for path in sorted(glob.glob(f"{d}/measure_ref*.log")):
        with open(path) as f:
            for ln in f:
                m = re.match(r"reference (\S+): .*rays/sec=([\d.]+)", ln)
                if m:
                    rows.append((m.group(1), float(m.group(2))))
    if rows:
        print()
        print("| reference config (device-bound) | rays/sec |")
        print("|---|---|")
        for tag, rate in rows:
            print(f"| {tag} | {rate:,.0f} |")


if __name__ == "__main__":
    main()
