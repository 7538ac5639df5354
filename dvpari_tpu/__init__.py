"""dvpari_tpu: a TPU-native DV-Pari designated-verifier SNARK framework.

A from-scratch JAX/Pallas re-architecture of the capabilities of
alpenlabs/dv-pari (Rust/C reference): sect233k1 binary-curve group and
MSM, the 232-bit scalar field Fr, the ECFFT polynomial engine over Fr,
SP1/gnark sparse-R1CS ingestion, and the setup / prove / verify
pipeline, with domain-sized vectors sharded over a `jax.sharding.Mesh`.

Layer map (mirrors SURVEY.md section 1; reference file:line cites are in
module docstrings):

- ops/        batched field + curve kernels (Fr, GF(2^233), xsk233, MSM)
- fftree/     ECFFT polynomial engine (FFTree build + enter/exit/extend/vanish)
- r1cs/       gnark/SP1 sparse R1CS ingestion and SR1CS transform
- protocol/   trapdoor setup, prover, Fiat-Shamir transcript, verifier
- storage/    artifact cache (bit-compatible vector file formats)
- parallel/   mesh construction and sharded collectives
- utils/      blake3, bit/byte helpers, structured timing
"""

__version__ = "0.1.0"
