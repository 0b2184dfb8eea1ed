#!/usr/bin/env python
"""Entry point mirroring the reference's `python train.py <overrides>`."""
from diffsep_tpu.cli.train import main

if __name__ == "__main__":
    main()
