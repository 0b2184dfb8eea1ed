#!/usr/bin/env python
"""Entry point mirroring the reference's `python figure_exp_inference.py`
(reference figure_exp_inference.py:22-81)."""
import logging

from diffsep_tpu.cli.figures import exp_inference

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    exp_inference()
