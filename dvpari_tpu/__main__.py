"""Command-line entry points for the DV-Pari TPU framework.

The reference exposes no CLI (its e2e "application" is a test,
reference: src/dvsnark_test.rs); here the same flows are first-class
commands so a user can drive setup / prove / verify / e2e / bench
against a cache directory.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _cmd_e2e(args):
    from dvpari_tpu.r1cs.toy import toy_r1cs_dump, toy_witness
    from dvpari_tpu.protocol import srs as srs_mod, prover as prover_mod
    from dvpari_tpu.storage import artifacts as art

    cache = args.cache_dir
    os.makedirs(cache, exist_ok=True)
    r1cs_path = os.path.join(cache, art.R1CS_CONSTRAINTS_FILE)
    if not os.path.exists(r1cs_path):
        with open(r1cs_path, "wb") as f:
            f.write(toy_r1cs_dump())
    pub, wit = toy_witness()
    td = srs_mod.Trapdoor.from_seed(args.seed.encode())
    t0 = time.time()
    srs_mod.verifier_runs_setup(td, cache, len(pub), True, True)
    print(f"setup: {time.time()-t0:.1f}s")
    t0 = time.time()
    prover_mod.prover_prepares_precomputes(cache, True)
    print(f"precompute: {time.time()-t0:.1f}s")
    t0 = time.time()
    proof = prover_mod.prove(cache, pub, wit)
    print(f"prove: {time.time()-t0:.1f}s")
    t0 = time.time()
    ok = srs_mod.verify(td, pub, proof)
    print(f"verify: {time.time()-t0:.1f}s -> {ok}")
    if args.proof_out:
        _write_proof(args.proof_out, proof)
    sys.exit(0 if ok else 1)


def _write_proof(path, proof):
    bits = proof.to_bits()
    data = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            data[i // 8] |= 1 << (i % 8)
    with open(path, "wb") as f:
        f.write(bytes(data))
    print(f"proof ({len(bits)} bits) -> {path}")


def _read_proof(path):
    from dvpari_tpu.protocol.proof import Proof

    with open(path, "rb") as f:
        data = f.read()
    bits = [bool((data[i // 8] >> (i % 8)) & 1) for i in range(944)]
    return Proof.from_bits(bits)


def _cmd_setup(args):
    from dvpari_tpu.protocol import srs as srs_mod

    td = srs_mod.Trapdoor.from_seed(args.seed.encode())
    t0 = time.time()
    srs_mod.verifier_runs_setup(
        td, args.cache_dir, args.public_inputs,
        not args.use_precomputes, not args.no_validate,
    )
    print(f"setup complete in {time.time()-t0:.1f}s (cache: {args.cache_dir})")


def _cmd_prove(args):
    from dvpari_tpu.protocol import prover as prover_mod
    from dvpari_tpu.r1cs import gnark

    from dvpari_tpu.ops import fr

    with open(args.witness_file, "rb") as f:
        wit = gnark.load_witness_limbs(f.read())
    head = fr.to_int(wit[:, : 1 + args.public_inputs])
    assert head[0] == 1, "witness must start with the constant-1 wire"
    pub = head[1:]
    priv = wit[:, 1 + args.public_inputs :]  # stays as limbs (scale path)
    prover_mod.prover_prepares_precomputes(args.cache_dir, not args.no_validate)
    t0 = time.time()
    proof = prover_mod.prove(args.cache_dir, pub, priv)
    print(f"prove: {time.time()-t0:.1f}s")
    _write_proof(args.proof_out, proof)


def _cmd_verify(args):
    from dvpari_tpu.protocol import srs as srs_mod

    td = srs_mod.Trapdoor.from_seed(args.seed.encode())
    proof = _read_proof(args.proof)
    pub = [int(x) for x in args.public_input]
    ok = srs_mod.verify(td, pub, proof)
    print(json.dumps({"valid": bool(ok)}))
    sys.exit(0 if ok else 1)


def main(argv=None):
    p = argparse.ArgumentParser(prog="dvpari_tpu")
    p.add_argument(
        "--platform",
        default=None,
        choices=["cpu", "tpu"],
        help="pin the jax platform; use cpu when no accelerator tunnel is "
        "up (the TPU plugin overrides JAX_PLATFORMS, so an env var alone "
        "cannot force CPU)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    e2e = sub.add_parser("e2e", help="toy-circuit end-to-end round trip")
    e2e.add_argument("--cache-dir", required=True)
    e2e.add_argument("--seed", default="dvpari-toy-43")
    e2e.add_argument("--proof-out", default=None)
    e2e.set_defaults(fn=_cmd_e2e)

    st = sub.add_parser("setup", help="verifier-side SRS setup")
    st.add_argument("--cache-dir", required=True)
    st.add_argument("--seed", required=True, help="trapdoor seed (keep secret)")
    st.add_argument("--public-inputs", type=int, default=2)
    st.add_argument("--use-precomputes", action="store_true",
                    help="expect downloaded domain precomputes (is_fresh_setup=False)")
    st.add_argument("--no-validate", action="store_true")
    st.set_defaults(fn=_cmd_setup)

    pr = sub.add_parser("prove", help="generate a proof from a witness file")
    pr.add_argument("--cache-dir", required=True)
    pr.add_argument("--witness-file", required=True)
    pr.add_argument("--public-inputs", type=int, default=2)
    pr.add_argument("--proof-out", default="proof.bits")
    pr.add_argument("--no-validate", action="store_true")
    pr.set_defaults(fn=_cmd_prove)

    vf = sub.add_parser("verify", help="designated-verifier check")
    vf.add_argument("--seed", required=True)
    vf.add_argument("--proof", required=True)
    vf.add_argument("--public-input", nargs="+", required=True)
    vf.set_defaults(fn=_cmd_verify)

    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    # multi-host: the DVPARI_COORDINATOR/_NUM_PROCESSES/_PROCESS_ID env
    # triple lights up jax.distributed before any backend touch; no-op
    # single-host (parallel/multihost.py)
    from dvpari_tpu.parallel import multihost

    multihost.maybe_initialize()
    args.fn(args)


if __name__ == "__main__":
    main()
