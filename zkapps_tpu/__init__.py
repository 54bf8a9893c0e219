"""zkapps_tpu — a TPU-native zkSNARK proving framework.

A from-scratch JAX/XLA/Pallas implementation of everything the
Cardinal-Cryptography/zk-apps Shielder stack needs (reference layer map in
/root/repo/SURVEY.md):

- ``fields``     BN254 Fr/Fq as limb-decomposed u32 batched kernels (ref: halo2curves pin,
                 shielder/Cargo.lock:454-456)
- ``hash``       Poseidon T=5/RATE=4/R_F=8/R_P=56 (ref: relations/src/lib.rs:17-26) + SHA256
- ``curve``      BN254 G1/G2 point arithmetic (host bignum + batched projective device ops)
- ``merkle``     Merkle tree + witness generation (ref: contract/merkle.rs)
- ``ntt``        radix-2 NTT over Fr (ref: halo2_proofs FFT, Cargo.lock:436-451)
- ``msm``        Pippenger multi-scalar multiplication over G1
- ``transcript`` blake2b Fiat-Shamir transcript (ref: halo2_proofs blake2b transcript)
- ``pcs``        KZG (+ IPA) polynomial commitment scheme
- ``pairing``    BN254 optimal-ate pairing for KZG verification (host)
- ``circuit``    flat witness-builder frontend (ref: halo2-base Context/GateChip semantics)
- ``relations``  Shielder's update_note / update_account / merkle relations
                 (ref: shielder/relations/src/)
- ``plonk``      PLONKish prover/verifier over the circuit frontend
- ``mocked``     plaintext proof-of-knowledge stand-in (ref: shielder/mocked_zk)
- ``chain``      in-process chain simulator: Shielder contract + PSP22 token
                 (ref: shielder/contract + drink sandbox)
- ``parallel``   device-mesh sharding helpers (shard_map MSM / NTT)
"""

__version__ = "0.1.0"
