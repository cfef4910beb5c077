"""Host CPU/RAM monitor (≙ `LOG_USE_CPU_MEMORY/use_memory.py`).

    python -m dehaze_tpu.cli.monitor [--interval 20] [--log cpu_mem.txt]
"""

import argparse

from dehaze_tpu.utils.monitor import monitor_loop


def main():
    p = argparse.ArgumentParser(description="cpu/ram monitor")
    p.add_argument("--interval", type=float, default=20.0)
    p.add_argument("--log", default=None)
    p.add_argument("--count", type=int, default=None,
                   help="stop after N samples (default: run forever, like "
                        "the reference's use_memory.py)")
    a = p.parse_args()
    monitor_loop(interval=a.interval, log_path=a.log, max_iters=a.count)


if __name__ == "__main__":
    main()
