#!/usr/bin/env python
"""Entry point mirroring the reference's `python separate.py in/ out/`."""
import logging

from diffsep_tpu.cli.separate import main

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
