"""Pin the SSD300 headline number to ONE protocol (round-4 VERDICT weak #4).

Runs bench.py's measurement N times back-to-back (same binaries, same
uncontended chip), prints every sample and the median +/- spread, and writes
BENCH_HEADLINE.json. The headline protocol is bench.py's: jitted DP train step,
donated buffers, 30 timed steps after warmup, device->host scalar fetch as the
sync. Run with the host otherwise idle.

Usage: python scripts/bench_headline.py [N]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    samples = []
    for i in range(n):
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            capture_output=True, text=True, check=False)
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        rec = json.loads(line)
        print(f"run {i + 1}/{n}: {rec['value']} {rec['unit']}", flush=True)
        samples.append(rec)
    vals = sorted(r["value"] for r in samples)
    med = vals[len(vals) // 2] if n % 2 else \
        0.5 * (vals[n // 2 - 1] + vals[n // 2])
    result = {
        "metric": samples[0]["metric"],
        "unit": samples[0]["unit"],
        "samples": [r["value"] for r in samples],
        "median": med,
        "spread_pct": round(100.0 * (vals[-1] - vals[0]) / med, 2),
        "vs_baseline": samples[len(samples) // 2]["vs_baseline"],
        "protocol": "bench.py x%d back-to-back, uncontended host+chip" % n,
    }
    with open(os.path.join(ROOT, "BENCH_HEADLINE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
