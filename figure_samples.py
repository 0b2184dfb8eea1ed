#!/usr/bin/env python
"""Entry point mirroring the reference's `python figure_samples.py`
(reference figure_samples.py:17-188)."""
import logging

from diffsep_tpu.cli.figures import samples

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    samples()
