"""Summarize reference-length protocol runs (tools/protocol_sapien.py)
into the PARITY.md table: final test_seg / vote metrics per arm, paired
deltas across arms sharing seeds, and per-epoch val-PQ trajectories.

Usage: python tools/protocol_report.py /tmp/ogc_protocol_s*_*/summary.json
"""

import glob
import json
import re
import sys

import numpy as np


def parse_metrics(text):
    out = {}
    m = re.search(r"AveragePrecision@50: ([0-9.]+)", text)
    if m:
        out["AP@50"] = float(m.group(1))
    m = re.search(r"PanopticQuality@50: ([0-9.]+) F1-score@50: ([0-9.]+)"
                  r" Prec@50: ([0-9.]+) Recall@50: ([0-9.]+)", text)
    if m:
        out["PQ@50"], out["F1@50"], out["Pre@50"], out["Rec@50"] = map(
            float, m.groups())
    m = re.search(r"'per_scan_iou_avg': ([0-9.]+)", text)
    if m:
        out["mIoU"] = float(m.group(1))
    m = re.search(r"'per_scan_ri_avg': ([0-9.]+)", text)
    if m:
        out["RI"] = float(m.group(1))
    return out


def main():
    paths = sys.argv[1:] or sorted(
        glob.glob("/tmp/ogc_protocol_*/summary.json"))
    runs = {}
    for p in paths:
        d = json.load(open(p))
        a = d["args"]
        arm = f"{a['mode']}" + ("+mutual" if a["graph"] == "mutual" else "")
        seed = a["seed"]
        entry = {
            "test": parse_metrics(d.get("test_seg", "")),
            "vote": parse_metrics(d.get("vote", "")),
            "wall_s": d.get("wall_s"),
        }
        # final + best val PQ trajectory per round
        for r, rd in d.get("rounds", {}).items():
            traj = rd.get("train_traj", {}).get("epoch_sum_val/PQ@50", [])
            if traj:
                vals = [v for _, v in traj]
                entry[f"R{r}_val_pq_final"] = vals[-1]
                entry[f"R{r}_val_pq_best"] = max(vals)
                entry[f"R{r}_val_pq_traj"] = vals
        runs.setdefault(arm, {})[seed] = entry
    metrics = ("AP@50", "PQ@50", "F1@50", "mIoU", "RI")
    print("\n## Final test_seg metrics (mean ± std over seeds)\n")
    print("| arm | n | " + " | ".join(metrics) + " | vote PQ@50 |")
    print("|---|---|" + "---|" * (len(metrics) + 1))
    for arm in sorted(runs):
        seeds = sorted(runs[arm])
        cells = []
        for m in metrics:
            vals = np.array([runs[arm][s]["test"].get(m, np.nan)
                             for s in seeds])
            cells.append(f"{np.nanmean(vals):.4f} ± {np.nanstd(vals):.4f}")
        vv = np.array([runs[arm][s]["vote"].get("PQ@50", np.nan)
                       for s in seeds])
        cells.append(f"{np.nanmean(vv):.4f} ± {np.nanstd(vv):.4f}")
        print(f"| {arm} | {len(seeds)} | " + " | ".join(cells) + " |")

    # Paired deltas vs the parity arm where seeds overlap.
    base = "parity"
    if base in runs:
        print("\n## Paired deltas vs parity (same seeds/scenes)\n")
        for arm in sorted(runs):
            if arm == base:
                continue
            shared = sorted(set(runs[arm]) & set(runs[base]))
            if not shared:
                continue
            for m in ("PQ@50", "mIoU", "RI"):
                da = np.array(
                    [runs[arm][s]["test"].get(m, np.nan) for s in shared])
                db = np.array(
                    [runs[base][s]["test"].get(m, np.nan) for s in shared])
                diff = da - db
                print(f"{arm} - {base} [{m}] n={len(shared)}: "
                      f"{np.nanmean(diff):+.4f} ± {np.nanstd(diff):.4f} "
                      f"({' '.join(f'{d:+.3f}' for d in diff)})")

    print("\n## Val-PQ trajectories (round 2, per arm/seed)\n")
    for arm in sorted(runs):
        for s in sorted(runs[arm]):
            tr = runs[arm][s].get("R2_val_pq_traj")
            if tr:
                picks = tr[::max(1, len(tr) // 10)]
                print(f"{arm} s{s}: " + " ".join(f"{v:.3f}" for v in picks)
                      + f" (final {tr[-1]:.3f}, best {max(tr):.3f})")


if __name__ == "__main__":
    main()
