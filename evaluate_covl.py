#!/usr/bin/env python
"""Entry point mirroring the reference's evaluate_covl.py."""
from diffsep_tpu.cli.evaluate_covl import main

if __name__ == "__main__":
    main()
