"""Host CPU/RAM monitor (≙ `LOG_USE_CPU_MEMORY/use_memory.py`).

    python -m dehaze_tpu.cli.monitor [--interval 20] [--log cpu_mem.txt]
"""

import argparse

from dehaze_tpu.utils.monitor import monitor_loop


def main():
    p = argparse.ArgumentParser(description="cpu/ram monitor")
    p.add_argument("--interval", type=float, default=20.0)
    p.add_argument("--log", default=None)
    a = p.parse_args()
    monitor_loop(interval=a.interval, log_path=a.log)


if __name__ == "__main__":
    main()
