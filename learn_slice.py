#!/usr/bin/env python
"""Slice-weight predictor trainers (reference: LearnSlice.py / SliceLearner.py).

``--mode code|previous|vorticity|slice_learner`` selects the head.
"""
from transformerbasednavierstokesolver_tpu.cli.learn_slice import main

if __name__ == "__main__":
    main()
