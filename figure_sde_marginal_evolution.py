#!/usr/bin/env python
"""Entry point mirroring the reference's `python figure_sde_marginal_evolution.py`
(reference figure_sde_marginal_evolution.py:40-134)."""
import logging

from diffsep_tpu.cli.figures import sde_marginal_evolution

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    sde_marginal_evolution()
