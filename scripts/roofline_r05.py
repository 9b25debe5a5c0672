"""Record the r05 roofline: the re-picked 64x16 flagship AND the old
96x16 point with the same ceiling micros, so the adoption's throughput
claim has a like-for-like artifact (results/roofline_r05.json).

The per-mode table is carried over from roofline_r04.json (the exact
bicubic row alone costs ~2 min of chip time and its gather bound did not
change); the cosine row is re-measured at the new flagship degrees.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results")


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.jax_cache"))
    from gqmap_tpu.kernels.roofline import flagship_roofline, measure_ceilings

    with open(os.path.join(RES, "roofline_r04.json")) as f:
        r04 = json.load(f)
    ceil = measure_ceilings()
    rec = {
        "ceilings": ceil,
        "modes_r04": r04["modes"],
        "flagship_64x16": flagship_roofline(A=64, B=16, ceilings=ceil),
        "flagship_96x16": flagship_roofline(A=96, B=16, ceilings=ceil),
        "note": "r05: flagship degrees re-picked 96x16 -> 64x16 from the "
                "measured accuracy frontier (degrees_frontier.jsonl + "
                "flag64x16_cosine campaign rows); both points recorded "
                "with the same ceiling micros",
    }
    out = os.path.join(RES, "roofline_r05.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=2)
    for k in ("flagship_64x16", "flagship_96x16"):
        fl = rec[k]
        print(json.dumps({
            "point": k,
            "kernel_ms": fl["pallas_cosine_kernel"]["ms"],
            "kernel_fraction": fl["pallas_cosine_kernel"]["fraction_of_bound"],
            "sweep_ms": fl["tpu_fast_sweep"]["ms"],
            "sweep_mpix": fl["tpu_fast_sweep"]["mpix_sweeps_per_s"],
        }))


if __name__ == "__main__":
    main()
