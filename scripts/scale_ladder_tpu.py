"""Run several scale-ladder rungs in ONE process.

The chunked pass engine + fixed recode width close the compile-program
universe across domain sizes, but a fresh process still pays the
persistent-cache EXECUTABLE RELOADS through the tunnel (~45-100 s per
program, measured on the m=2^18 validate_z: 902 s that is almost
entirely reloads of already-compiled programs).  Running the rungs
in-process loads each program exactly once for the whole ladder.

Usage:  python scripts/scale_ladder_tpu.py 18 20 18mt
  NNmt runs the SP1-realistic multi-term circuit variant
  (DVPARI_SCALE_CIRCUIT=multiterm) at m=2^NN.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scale_e2e_tpu


def run(spec: str) -> None:
    if spec.endswith("mt"):
        os.environ["DVPARI_SCALE_CIRCUIT"] = "multiterm"
        log_m = int(spec[:-2])
    else:
        os.environ.pop("DVPARI_SCALE_CIRCUIT", None)
        log_m = int(spec)
    print(f"===== ladder rung: {spec} =====", flush=True)
    scale_e2e_tpu.main(log_m)


if __name__ == "__main__":
    for spec in sys.argv[1:]:
        run(spec)
