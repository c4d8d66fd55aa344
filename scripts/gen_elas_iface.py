#!/usr/bin/env python
"""Generate the near-interface elasticity cache (VERDICT r4 item 6).

Same FEM/void machinery as the banked elas_fem_n5000 cache, but in the
``iface`` sampling regime (solvers.elasticity_sample): modulus-weighted
one-sided interface stress + 4x near-interface importance sampling, the
distribution the reference's point clouds actually have
(/root/reference/exp_elas.py:54-60).  Cache key: elas_fem_iface_n5000.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TBNSS_PLATFORM"] = "cpu"
os.environ["TBNSS_ELAS_SAMPLING"] = "iface"
import jax
jax.config.update("jax_platforms", "cpu")
from transformerbasednavierstokesolver_tpu.data import datasets as D

D.load_elasticity("/nonexistent", ntrain=1, ntest=1, synth_n=4000)
print("ELAS_IFACE_DONE", flush=True)
