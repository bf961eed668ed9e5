"""Extended randomized-parity soak: run the CI fuzz cases over many
seeds (CI pins 3 seeds each; rare tie-break/sentinel corners deserve a
wider sweep before a release).

    JAX_PLATFORMS=cpu python scripts/soak_fuzz.py [n_seeds] [start]

Exits nonzero on the first mismatch, printing the failing (test, seed).
"""

import sys
import tempfile
from pathlib import Path


def main():
    # absolute paths: the hpv16 fuzz case chdirs into its tempdir, which
    # breaks relative sys.path entries (and any lazy rkmh_tpu import)
    root = str(Path(__file__).resolve().parent.parent)
    sys.path.insert(0, str(Path(root) / "tests"))
    sys.path.insert(0, root)
    import test_fuzz_parity as fuzz
    import test_hpv16

    class _Chdir:
        """Minimal monkeypatch stand-in for direct test invocation."""

        def chdir(self, path):
            import os

            os.chdir(path)

    def _hpv16(td, seed):
        # pytest's monkeypatch restores chdir when the test ends; the
        # stand-in must too, or every later subprocess case starts in a
        # DELETED tempdir (.tst writes fail with ENOENT)
        import os

        cwd = os.getcwd()
        try:
            test_hpv16.test_hpv16_fuzz_matches_oracle(td, _Chdir(), seed)
        finally:
            os.chdir(cwd)

    def _counters(td, seed):
        fuzz.test_stream_counter_fuzz_matches_oracle(td, seed)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cases = [
        ("stream", fuzz.test_stream_fuzz_matches_oracle),
        ("filter", fuzz.test_filter_fuzz_matches_oracle),
        ("counters", _counters),
        ("call", fuzz.test_call_fuzz_matches_oracle),
        ("hpv16", _hpv16),
        ("devices", fuzz.test_devices_fuzz_matches_single),
        ("call-devices", fuzz.test_call_devices_fuzz_matches_single),
        ("dist", fuzz.test_dist_fuzz_matches_single),
        ("dist-call", fuzz.test_dist_call_fuzz_matches_single),
    ]
    for seed in range(start, start + n):
        for name, fn in cases:
            with tempfile.TemporaryDirectory() as td:
                try:
                    fn(Path(td), seed)
                except AssertionError:
                    print(f"MISMATCH: {name} seed={seed}", flush=True)
                    raise
        if (seed - start + 1) % 10 == 0:
            print(f"{seed - start + 1}/{n} seeds clean", flush=True)
            # every seed compiles fresh shapes; drop the executables or a
            # long soak OOMs the in-process XLA:CPU jit cache
            import jax

            jax.clear_caches()
    print(f"OK: {n} seeds x {len(cases)} pipelines match the oracle")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
