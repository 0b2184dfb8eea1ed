#!/usr/bin/env python
"""Entry point mirroring the reference's merge_dnsmos.py."""
from diffsep_tpu.cli.merge_dnsmos import main

if __name__ == "__main__":
    main()
