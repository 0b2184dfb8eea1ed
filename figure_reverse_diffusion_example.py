#!/usr/bin/env python
"""Entry point mirroring the reference's `python figure_reverse_diffusion_example.py`
(reference figure_reverse_diffusion_example.py:33-109)."""
import logging

from diffsep_tpu.cli.figures import reverse_diffusion_example

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    reverse_diffusion_example()
