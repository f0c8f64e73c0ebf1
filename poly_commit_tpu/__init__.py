"""poly_commit_tpu: TPU-native polynomial commitment framework.

A from-scratch JAX/XLA re-design with the capabilities of
arkworks-rs/poly-commit (reference mounted at /root/reference): nine
commitment schemes over a shared kernel substrate (limb field arithmetic,
Pippenger MSM, radix-2 NTT, pairings) with multi-chip sharding via
jax.sharding meshes (parallel/mesh.py).

Schemes (see SURVEY.md §2.2 for the inventory this mirrors):
  pcs.kzg10            — vanilla KZG10 building block
  pcs.marlin_pc        — MarlinKZG10 (degree bounds via shifted G1 commitments)
  pcs.sonic_pc         — SonicKZG10 (degree bounds via negative G2 powers)
  pcs.pst13            — MarlinPST13 (sparse multivariate)
  pcs.ipa_pc           — InnerProductArgPC (pairing-free, JubJub)
  pcs.hyrax            — HyraxPC (multilinear, BN254)
  pcs.linear_codes     — Ligero (uni + ML) and Brakedown via a generic engine
  pcs.multilinear_pc   — MultilinearPC (XZZPD19, standalone)
  pcs.streaming_kzg    — Gemini time/chunked provers (standalone)
"""

__version__ = "0.1.0"
