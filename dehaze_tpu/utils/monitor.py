"""Host CPU/RAM monitor (reference `LOG_USE_CPU_MEMORY/use_memory.py:5-15`)."""

from __future__ import annotations

import threading
import time
from typing import Optional


def monitor_loop(interval: float = 20.0, cpu_sample_secs: float = 2.0,
                 log_path: Optional[str] = None, stop_event=None,
                 max_iters: Optional[int] = None) -> None:
    """Print (and optionally append) 'cpu% mem%' every `interval` seconds.

    `max_iters` bounds the loop (None = run until stop_event / forever,
    the reference's behavior)."""
    import psutil

    fh = open(log_path, "a") if log_path else None
    done = 0
    try:
        while ((stop_event is None or not stop_event.is_set())
               and (max_iters is None or done < max_iters)):
            cpu = psutil.cpu_percent(interval=cpu_sample_secs)
            mem = psutil.virtual_memory().percent
            line = f"{time.strftime('%H:%M:%S')} cpu {cpu:5.1f}%  mem {mem:5.1f}%"
            print(line, flush=True)
            if fh:
                fh.write(line + "\n")
                fh.flush()
            done += 1
            if max_iters is not None and done >= max_iters:
                break
            time.sleep(max(interval - cpu_sample_secs, 0))
    finally:
        if fh:
            fh.close()


def start_background_monitor(interval: float = 20.0, log_path: Optional[str] = None):
    """Run the monitor in a daemon thread; returns a stop Event."""
    stop = threading.Event()
    t = threading.Thread(
        target=monitor_loop, kwargs=dict(interval=interval, log_path=log_path,
                                         stop_event=stop), daemon=True)
    t.start()
    return stop
