"""Tkinter GUI launcher for the workflow steps.

Parity: reference ``presets/workflows/user_interface_gui.py`` (2,394 LoC
Tkinter app with multiprocessing workers).  This compact version provides
the same process model — workflow steps run in worker processes with log
and progress queues — behind a minimal Tk window; on headless systems it
exits with a clear message pointing to the CLI front-ends.
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import queue
import sys
from pathlib import Path

logger = logging.getLogger(__name__)

__all__ = ["launch_gui", "run_step_in_worker", "main"]

_STEPS = {
    "setup: rig": ("darsia_tpu.presets.workflows.setup", "setup_rig"),
    "setup: depth": ("darsia_tpu.presets.workflows.setup", "setup_depth_map"),
    "calibration: color paths": (
        "darsia_tpu.presets.workflows.calibration",
        "calibration_color_paths",
    ),
    "calibration: color to mass": (
        "darsia_tpu.presets.workflows.calibration",
        "calibration_color_to_mass_analysis",
    ),
    "analysis: mass": (
        "darsia_tpu.presets.workflows.analysis",
        "run_mass_analysis",
    ),
}


def _worker(module_name: str, function_name: str, config_path: str, log_queue):
    import importlib

    handler = logging.handlers.QueueHandler(log_queue) if hasattr(
        logging, "handlers"
    ) else None
    if handler is not None:
        logging.getLogger().addHandler(handler)
        logging.getLogger().setLevel(logging.INFO)
    module = importlib.import_module(module_name)
    try:
        getattr(module, function_name)(Path(config_path))
        log_queue.put(("done", f"{function_name} finished."))
    except Exception as e:  # surface errors to the GUI log
        log_queue.put(("error", f"{function_name} failed: {e}"))


def run_step_in_worker(step: str, config_path: str):
    """Spawn a workflow step in a worker process; returns (process, queue)."""
    module_name, function_name = _STEPS[step]
    log_queue: mp.Queue = mp.Queue()
    process = mp.Process(
        target=_worker,
        args=(module_name, function_name, config_path, log_queue),
        daemon=True,
    )
    process.start()
    return process, log_queue


def launch_gui(config_path=None) -> None:
    try:
        import tkinter as tk
        from tkinter import filedialog, scrolledtext
    except Exception as e:
        raise RuntimeError(
            "Tkinter is not available in this environment. Use the CLI "
            "front-ends instead, e.g. python -m "
            "darsia_tpu.presets.workflows.user_interface_analysis "
            "--config config.toml --mass"
        ) from e

    root = tk.Tk()
    root.title("darsia_tpu workflows")
    state = {"config": config_path, "process": None, "queue": None}

    log_box = scrolledtext.ScrolledText(root, width=100, height=24)
    log_box.grid(row=2, column=0, columnspan=len(_STEPS) + 1)

    def log(message: str) -> None:
        log_box.insert(tk.END, message + "\n")
        log_box.see(tk.END)

    def choose_config() -> None:
        state["config"] = filedialog.askopenfilename(
            filetypes=[("TOML", "*.toml")]
        )
        log(f"Config: {state['config']}")

    def start(step: str) -> None:
        if not state["config"]:
            log("Select a config first.")
            return
        process, log_queue = run_step_in_worker(step, state["config"])
        state["process"], state["queue"] = process, log_queue
        log(f"Started {step} (pid {process.pid}).")
        poll()

    def poll() -> None:
        if state["queue"] is None:
            return
        try:
            while True:
                kind, message = state["queue"].get_nowait()
                log(f"[{kind}] {message}")
        except queue.Empty:
            pass
        if state["process"] is not None and state["process"].is_alive():
            root.after(250, poll)

    tk.Button(root, text="Choose config", command=choose_config).grid(
        row=0, column=0
    )
    for i, step in enumerate(_STEPS, start=1):
        tk.Button(
            root, text=step, command=lambda s=step: start(s)
        ).grid(row=0, column=i)
    root.mainloop()


def main(argv=None) -> None:
    config = argv[0] if argv else (sys.argv[1] if len(sys.argv) > 1 else None)
    launch_gui(config)


if __name__ == "__main__":
    main()
