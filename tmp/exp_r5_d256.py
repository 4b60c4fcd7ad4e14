"""Round 5: refresh the D=256 MXU-scaling rows (VERDICT r4 item 5).

The round-3 table predates round 4's bf16 HBM streaming and the
residual-saving backward, and round 5's per-level class dispatch + flat
512 one-hot chunk. Re-measures kernel-vs-XLA fwd and the full train step
at the requested dims/dtypes. Fresh process per arm (CLAUDE.md: repeated
Pallas compiles in one process can wedge the tunnel):

  python tmp/exp_r5_d256.py 256 float32
  python tmp/exp_r5_d256.py 256 bfloat16
"""
import sys

sys.path.insert(0, "/root/repo")

from bench import measure_roundtrip, log
from tmp.exp_r3_d128 import run_dim


def main():
    import jax

    D = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dt = sys.argv[2] if len(sys.argv) > 2 else "float32"
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rt = measure_roundtrip()
    log(f"backend {jax.default_backend()}, roundtrip {rt*1e3:.1f} ms, K={K}")
    row = run_dim(D, dt, rt, K=K)
    import json

    print(json.dumps(row))


if __name__ == "__main__":
    main()
