"""Re-record the flagship roofline with the current ceiling micros.

Rewrites the ``ceilings`` + ``flagship`` sections of
``results/roofline_r03.json`` in place, keeping the per-mode table from the
full earlier run (the exact-bicubic row alone costs ~2 min of chip time and
its gather bound did not change). Motivation: the r03 file was recorded with
the sqrt-blend VPU micro that under-reported the elementwise ceiling enough
to put the cosine kernel at a meaningless 1.09 "fraction of bound"; the
pure-FMA-chain micro (kernels/roofline.py) replaces it.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "results", "roofline_r03.json")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    from gqmap_tpu.kernels.roofline import flagship_roofline, measure_ceilings

    with open(PATH) as f:
        rec = json.load(f)
    ceil = measure_ceilings()
    flag = flagship_roofline(ceilings=ceil)
    rec["ceilings"] = ceil
    rec["flagship"] = flag
    # The per-mode efficiency rows keep their measured ms but their VPU
    # bounds move with the ceiling — recompute those in place.
    for mode, row in rec.get("modes", {}).items():
        if row.get("governing_bound") == "vpu":
            old_bound = row["bound_ms"]
            # bound scales inversely with the ceiling flop rate
            row["bound_ms"] = old_bound * 1249.088675162447 / ceil["vpu_GFLOPs"]
            row["efficiency_vs_bound"] = min(1.0, row["bound_ms"] / row["ms_per_sweep"])
    with open(PATH, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({"ceilings": ceil,
                      "kernel_fraction": flag["pallas_cosine_kernel"]["fraction_of_bound"],
                      "sweep_fraction": flag["tpu_fast_sweep"]["fraction_of_bound"]}))


if __name__ == "__main__":
    main()
