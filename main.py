#!/usr/bin/env python
"""CLI wrapper (reference: main.py).  See viewfusion_tpu/cli.py."""

from viewfusion_tpu.cli import main

if __name__ == "__main__":
    main()
