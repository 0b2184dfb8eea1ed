#!/usr/bin/env python
"""Entry point mirroring the reference's `python evaluate.py <ckpt> ...`."""
from diffsep_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
