"""Collect the round-5 window-64 validation runs into one artifact.

Reads the per-run JSONs the validation batch writes under ``runs/`` and
produces ``WINDOW64_VALIDATION.json``: the seed-robustness evidence for
unpinning the production window (VERDICT r4 item 1), the degraded-turn
burst-rescue gates (item 2), and the ScanContext-vs-descriptor candidate
A/B (item 5).

Usage: python examples/collect_validation.py [--json-out WINDOW64_VALIDATION.json]
"""
import argparse
import glob
import json
import os

KEYS = ["frames", "window", "pipeline_seed", "candidate_source",
        "success_rate", "rre_deg", "rte_m",
        "ate_raw_m", "ate_dejumped_m", "ate_refined_m", "ate_final_m",
        "n_loop_closures", "loop_precision", "loop_recall",
        "refined_spans", "burst_spans", "burst_accepted", "burst_gains",
        "success_rate_refined", "rre_deg_refined", "gates_pass"]


def load(path):
    with open(path) as f:
        d = json.load(f)
    row = {k: d.get(k) for k in KEYS if k in d}
    st = d.get("stage_seconds", {})
    row["stage_s"] = {k: round(v["total_s"], 1) for k, v in st.items()}
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-dir", default="runs")
    ap.add_argument("--json-out", default="WINDOW64_VALIDATION.json")
    args = ap.parse_args()

    out = {"degraded_w64": [], "degraded_turn_w64": [], "clean_w64": [],
           "candidate_ab": []}
    for p in sorted(glob.glob(os.path.join(args.runs_dir,
                                           "hb_deg_w64_s*.json"))):
        if p.endswith("_sc.json"):
            continue
        out["degraded_w64"].append(load(p))
    for p in sorted(glob.glob(os.path.join(args.runs_dir,
                                           "hb_degturn_w64_s*.json"))):
        out["degraded_turn_w64"].append(load(p))
    p = os.path.join(args.runs_dir, "hb_clean_w64.json")
    if os.path.exists(p):
        out["clean_w64"].append(load(p))
    for p in (os.path.join(args.runs_dir, "hb_clean_w64_sc.json"),
              os.path.join(args.runs_dir, "hb_deg_w64_sc.json")):
        if os.path.exists(p):
            out["candidate_ab"].append(load(p))

    for group in ("degraded_w64", "degraded_turn_w64", "clean_w64"):
        rows = out[group]
        out[group + "_pass"] = (bool(rows)
                                and all(r.get("gates_pass") for r in rows))
    out["verdict"] = {
        "window64_production_ready": bool(
            out["degraded_w64_pass"] and out["clean_w64_pass"]),
        "burst_rescue_validated": out["degraded_turn_w64_pass"],
    }
    print(json.dumps(out, indent=2))
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
