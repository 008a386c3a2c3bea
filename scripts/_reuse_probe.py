"""Test helper: writes a trivial JSON row (used by eval-suite reuse tests)."""
import argparse, json, time
ap = argparse.ArgumentParser()
ap.add_argument("--json-out", required=True)
ap.add_argument("--tag", default="x")
a = ap.parse_args()
json.dump({"tag": a.tag, "t": time.time()}, open(a.json_out, "w"))
