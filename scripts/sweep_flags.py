"""XLA flag sweep for the SSD300 train step (one bench.py subprocess per
variant; unknown/rejected flags simply fail that variant and the sweep moves
on). Client-set ``xla_*`` flags are forwarded per-compile by the axon terminal
(only the terminal's pinned LIBTPU_INIT_ARGS list is overridden), so this is a
legitimate A/B channel. Run at a queue boundary — needs the chip exclusively.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = [
    ("scoped_vmem_64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("scoped_vmem_128m", "--xla_tpu_scoped_vmem_limit_kib=131072"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("aggressive_fusion", "--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    ("licm", "--xla_tpu_licm_size_inflation_ratio=1"),
    ("bundle_cost", "--xla_tpu_use_bundle_aware_cost_model=true"),
]


def main():
    results = {}
    base_flags = os.environ.get("XLA_FLAGS", "")
    for name, flags in VARIANTS:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (base_flags + " " + flags).strip()
        env["BENCH_STEPS"] = os.environ.get("BENCH_STEPS", "20")
        # note: the persistent compile cache keys include the XLA flag set, so
        # each variant compiles (or warm-hits) its own executable correctly
        try:
            out = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                                 capture_output=True, text=True, timeout=1500)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            results[name] = json.loads(line[-1])["value"] if line else \
                f"no output (rc={out.returncode}): {out.stderr[-300:]}"
        except Exception as e:
            results[name] = f"error: {e!r}"
        print(name, "->", results[name], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
