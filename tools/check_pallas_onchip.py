"""On-chip correctness artifact for the Pallas/Mosaic kernels.

VERDICT round 2 weak #5: the Pallas kernels' on-chip correctness was
claimed in NOTES.md but captured in no driver artifact (CPU tests run
them in interpret mode).  This runs each kernel on the REAL backend and
writes one JSON line per kernel with an exact-equality verdict against
its lax reference:

  - minimizer_pallas.fast_scan_pallas  vs minimizer.fast_scan
  - bitonic_pallas.sort_pairs          vs lax.sort
  - bitonic_pallas.sort_pairs_hybrid   vs lax.sort
  - mergepath_pallas.sort_pairs_mergepath vs lax.sort

  python tools/check_pallas_onchip.py --out runs/pallas_onchip_r3.jsonl
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="")
    ap.add_argument("--n", type=int, default=1 << 21)
    args = ap.parse_args()

    from genome_assembly_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    lines = []

    def emit(**kw):
        line = json.dumps(kw)
        print(line, flush=True)
        lines.append(line)

    platform = jax.devices()[0].platform
    emit(event="config", platform=platform, n=args.n)

    rng = np.random.default_rng(7)

    # 1. minimizer scan
    from genome_assembly_tpu.ops import minimizer
    from genome_assembly_tpu.ops import minimizer_pallas

    codes = jnp.asarray(rng.integers(0, 4, size=(512, 128), dtype=np.uint8))
    lengths = jnp.full((512,), 128, jnp.int32)
    k, m = 31, 7
    want = minimizer.fast_scan(codes, lengths, k=k, m=m)
    got = minimizer_pallas.fast_scan_pallas(codes, lengths, k=k, m=m)
    ok = all(
        bool(jnp.array_equal(getattr(got, f), getattr(want, f)))
        for f in ("mmer", "kmer_hi", "kmer_lo", "valid")
    )
    emit(kernel="fast_scan_pallas", equal=ok)

    # 2-4. sorts
    hi = jnp.asarray(rng.integers(0, 1 << 32, args.n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, args.n, dtype=np.uint32))
    whi, wlo = lax.sort((hi, lo), num_keys=2)
    whi, wlo = np.asarray(whi), np.asarray(wlo)

    from genome_assembly_tpu.ops import bitonic_pallas, mergepath_pallas

    for name, fn in (
        ("sort_pairs", bitonic_pallas.sort_pairs),
        ("sort_pairs_hybrid", bitonic_pallas.sort_pairs_hybrid),
        ("sort_pairs_mergepath", mergepath_pallas.sort_pairs_mergepath),
    ):
        try:
            ghi, glo = fn(hi, lo)
            ok = bool(
                np.array_equal(np.asarray(ghi), whi)
                and np.array_equal(np.asarray(glo), wlo)
            )
            emit(kernel=name, equal=ok)
        except Exception as exc:  # record, don't abort the artifact
            emit(kernel=name, equal=False, error=str(exc)[:500])

    if args.out:
        pathlib.Path(args.out).write_text("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
