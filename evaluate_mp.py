#!/usr/bin/env python
"""Entry point mirroring the reference's `python evaluate_mp.py <ckpt> ...`."""
from diffsep_tpu.cli.evaluate_mp import main

if __name__ == "__main__":
    main()
