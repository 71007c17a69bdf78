"""Tkinter GUI for the workflow steps.

Parity: reference ``presets/workflows/user_interface_gui.py`` (2,394 LoC
Tkinter app).  Same architecture: workflow steps run in ``multiprocessing``
worker processes; logs, typed progress events, and low-resolution preview
frames are forwarded over queues; a session cache (JSON) remembers the
last configuration between launches; worker crashes are reported over the
queue with an error sentinel.

The queue protocol and session management live in the headless-testable
:class:`GuiSession` / :class:`WorkerHandle` (the reference tests its GUI
the same way — "GUI logic tested headlessly via queue protocol, no
display", SURVEY §4); the Tk layer on top renders log panes, per-step
progress bars, and streamed preview images.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import multiprocessing as mp
import queue
import sys
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Optional

logger = logging.getLogger(__name__)

__all__ = ["GuiSession", "WorkerHandle", "launch_gui", "run_step_in_worker", "main"]

# Error sentinel prefix (reference user_interface_gui.py:37).
ERROR_SENTINEL = "__DARSIA_WORKER_ERROR__:"

# Registry of launchable steps: label -> (module, function, kind).
# kind "context" steps receive (ctx, progress_callback, stream_callback);
# kind "config" steps receive the config path.
STEP_REGISTRY = {
    "setup: rig": (
        "darsia_tpu.presets.workflows.setup", "setup_rig", "config",
    ),
    "setup: depth": (
        "darsia_tpu.presets.workflows.setup", "setup_depth_map", "config",
    ),
    "setup: facies": (
        "darsia_tpu.presets.workflows.setup", "setup_facies", "config",
    ),
    "setup: labeling": (
        "darsia_tpu.presets.workflows.setup", "setup_labeling", "config",
    ),
    "setup: protocols": (
        "darsia_tpu.presets.workflows.setup", "setup_protocols", "config",
    ),
    "calibration: color paths": (
        "darsia_tpu.presets.workflows.calibration",
        "calibration_color_paths", "config",
    ),
    "calibration: color to mass": (
        "darsia_tpu.presets.workflows.calibration",
        "calibration_color_to_mass_analysis", "config",
    ),
    "analysis: cropping": (
        "darsia_tpu.presets.workflows.analysis",
        "analysis_cropping_from_context", "context",
    ),
    "analysis: segmentation": (
        "darsia_tpu.presets.workflows.analysis",
        "analysis_segmentation_from_context", "context",
    ),
    "analysis: thresholding": (
        "darsia_tpu.presets.workflows.analysis",
        "analysis_thresholding_from_context", "context",
    ),
    "analysis: fingers": (
        "darsia_tpu.presets.workflows.analysis",
        "analysis_fingers_from_context", "context",
    ),
    "analysis: mass": (
        "darsia_tpu.presets.workflows.analysis",
        "analysis_mass_from_context", "context",
    ),
    "analysis: volume": (
        "darsia_tpu.presets.workflows.analysis",
        "analysis_volume_from_context", "context",
    ),
    "comparison: wasserstein": (
        "darsia_tpu.presets.workflows.comparison",
        "comparison_wasserstein", "config",
    ),
    "helper: color report": (
        "darsia_tpu.presets.workflows.helper.helper_color",
        "helper_color", "config",
    ),
    "helper: roi overview": (
        "darsia_tpu.presets.workflows.helper.helper_roi",
        "helper_roi_viewer", "config",
    ),
    "utils: media": (
        "darsia_tpu.presets.workflows.utils.utils_media",
        "build_media", "config",
    ),
    "utils: export calibration bundle": (
        "darsia_tpu.presets.workflows.utils.calibration_bundle",
        "export_calibration_bundle", "config",
    ),
}


def _worker(
    module_name: str,
    function_name: str,
    kind: str,
    config_path: str,
    all_images: bool,
    log_queue,
    progress_queue,
    preview_queue,
    jax_platform: Optional[str] = None,
    jax_cache_dir: Optional[str] = None,
    step_kwargs: Optional[dict] = None,
) -> None:
    """Worker entry point: run one step, forward logs/progress/previews.

    Reference parity: QueueLogHandler + stream/progress queues
    (``user_interface_gui.py:722-870``); any exception is reported over
    the log queue with the error sentinel instead of killing the GUI.
    """
    try:
        # Debuggability: `kill -USR1 <worker-pid>` dumps the worker's
        # current Python traceback to stderr (hung-step diagnosis).
        import faulthandler
        import signal as _signal

        faulthandler.register(_signal.SIGUSR1)
    except Exception:
        pass
    if jax_platform is not None:
        # Spawned workers re-initialize JAX from scratch; inherit the
        # parent's backend choice (site config may pin a different
        # platform via env, so jax.config is the only reliable channel —
        # it must be updated before any device is touched).
        try:
            import jax

            jax.config.update("jax_platforms", jax_platform)
        except Exception:
            pass
    if jax_cache_dir is not None:
        # Share the persistent compilation cache so workers skip XLA
        # recompiles of programs the session (or a previous worker) has
        # already built — without it a fresh worker recompiles the whole
        # correction/analysis pipeline from scratch on every step.
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", jax_cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        except Exception:
            pass
    root_logger = logging.getLogger()
    root_logger.addHandler(logging.handlers.QueueHandler(log_queue))
    root_logger.setLevel(logging.INFO)

    def progress_callback(event: dict) -> None:
        try:
            progress_queue.put_nowait(event)
        except Exception:
            pass

    def stream_callback(images: dict) -> None:
        try:
            preview_queue.put_nowait(images)
        except Exception:
            pass

    try:
        import importlib

        module = importlib.import_module(module_name)
        function = getattr(module, function_name)
        if kind == "context":
            from .analysis.analysis_context import prepare_analysis_context
            from .rig import Rig

            ctx = prepare_analysis_context(
                cls=Rig,
                path=Path(config_path),
                all=all_images,
                require_color_to_mass=function_name
                in ("analysis_mass_from_context", "analysis_volume_from_context",
                    "analysis_fingers_from_context"),
            )
            kwargs = {}
            import inspect

            signature = inspect.signature(function)
            if "progress_callback" in signature.parameters:
                kwargs["progress_callback"] = progress_callback
            if "stream_callback" in signature.parameters:
                kwargs["stream_callback"] = stream_callback
            # Validated per-step form options (gui_support.step_parameters)
            # forward to matching keyword parameters.
            for name, value in (step_kwargs or {}).items():
                if name in signature.parameters:
                    kwargs[name] = value
            function(ctx, **kwargs)
        else:
            function(Path(config_path))
        progress_queue.put(("__done__", function_name))
    except Exception as exc:  # surface errors to the GUI over the queue
        import traceback

        log_queue.put(
            logging.makeLogRecord(
                {
                    "msg": f"{ERROR_SENTINEL}{function_name} failed: {exc}\n"
                    + traceback.format_exc(limit=10),
                    "levelno": logging.ERROR,
                    "levelname": "ERROR",
                }
            )
        )
        progress_queue.put(("__failed__", str(exc)))


@dataclass
class WorkerHandle:
    """A running workflow step with its communication queues."""

    step: str
    process: mp.Process
    log_queue: mp.Queue
    progress_queue: mp.Queue
    preview_queue: mp.Queue
    started_at: float = field(default_factory=time.time)
    finished: bool = False
    failed: bool = False

    def alive(self) -> bool:
        return self.process.is_alive()

    def poll(
        self,
        on_log: Optional[Callable[[str], None]] = None,
        on_progress: Optional[Callable[[dict], None]] = None,
        on_preview: Optional[Callable[[dict], None]] = None,
        max_events: int = 256,
    ) -> dict:
        """Drain the queues into callbacks; returns drained counts."""
        counts = {"log": 0, "progress": 0, "preview": 0}
        for _ in range(max_events):
            try:
                record = self.log_queue.get_nowait()
            except queue.Empty:
                break
            counts["log"] += 1
            message = (
                record.getMessage()
                if isinstance(record, logging.LogRecord)
                else str(record)
            )
            if message.startswith(ERROR_SENTINEL):
                self.failed = True
                message = message[len(ERROR_SENTINEL):]
            if on_log is not None:
                on_log(message)
        for _ in range(max_events):
            try:
                event = self.progress_queue.get_nowait()
            except queue.Empty:
                break
            counts["progress"] += 1
            if isinstance(event, tuple) and event and event[0] == "__done__":
                self.finished = True
                continue
            if isinstance(event, tuple) and event and event[0] == "__failed__":
                self.finished = True
                self.failed = True
                continue
            if on_progress is not None:
                on_progress(event)
        for _ in range(max_events):
            try:
                images = self.preview_queue.get_nowait()
            except queue.Empty:
                break
            counts["preview"] += 1
            if on_preview is not None:
                on_preview(images)
        return counts

    def stop(self) -> None:
        if self.process.is_alive():
            self.process.terminate()
            self.process.join(timeout=5)


class GuiSession:
    """Headless GUI core: step registry, workers, session cache.

    The session cache (JSON) stores the last selected config files, step
    and flags, so relaunching the GUI restores the previous state
    (reference session cache, ``user_interface_gui.py``).
    """

    def __init__(self, cache_path: Optional[Path] = None) -> None:
        self.cache_path = (
            Path(cache_path)
            if cache_path is not None
            else Path.home() / ".darsia_tpu" / "gui_session.json"
        )
        self.state: dict = {
            "config": None,
            "last_step": None,
            "all_images": False,
            "history": [],
        }
        self.load_cache()
        self.workers: list[WorkerHandle] = []

    # ------------------------------------------------------------ cache

    def load_cache(self) -> None:
        try:
            if self.cache_path.exists():
                self.state.update(json.loads(self.cache_path.read_text()))
        except Exception:
            logger.warning("Session cache unreadable; starting fresh.")

    def save_cache(self) -> None:
        try:
            self.cache_path.parent.mkdir(parents=True, exist_ok=True)
            self.cache_path.write_text(json.dumps(self.state, indent=2))
        except OSError:
            logger.warning("Session cache not writable.")

    def set_config(self, config_path) -> None:
        self.state["config"] = str(config_path)
        self.save_cache()

    # ----------------------------------------------------------- workers

    @property
    def steps(self) -> list:
        return list(STEP_REGISTRY)

    def step_parameters(self, step: str):
        """Form fields for a step (per-step parameter forms)."""
        from .gui_support import step_parameters

        return step_parameters(step)

    def start_step(
        self,
        step: str,
        config_path=None,
        all_images: Optional[bool] = None,
        options: Optional[dict] = None,
    ) -> WorkerHandle:
        if step not in STEP_REGISTRY:
            raise KeyError(f"Unknown step {step!r}; known: {self.steps}")
        config = str(config_path or self.state.get("config") or "")
        if not config:
            raise ValueError("No config selected.")
        module_name, function_name, kind = STEP_REGISTRY[step]
        from .gui_support import validate_options

        validated = validate_options(step, options)
        if all_images is None and options is not None and "all_images" in options:
            all_images = validated["all_images"]
        step_kwargs = {
            k: v for k, v in validated.items() if k != "all_images"
        }
        all_flag = (
            self.state.get("all_images", False)
            if all_images is None
            else bool(all_images)
        )
        # "spawn" keeps workers safe with an initialized JAX runtime in
        # the parent (forking a live TPU/XLA client can deadlock).
        ctx = mp.get_context("spawn")
        log_queue: mp.Queue = ctx.Queue()
        progress_queue: mp.Queue = ctx.Queue()
        preview_queue: mp.Queue = ctx.Queue()
        # Forward the parent's JAX backend so workers compute on the same
        # platform as the session (a spawned child would otherwise fall
        # back to whatever the site config pins).
        jax_platform = None
        jax_cache_dir = "/tmp/jax_cache"
        if "jax" in sys.modules:
            try:
                jax_platform = sys.modules["jax"].default_backend()
            except Exception:
                jax_platform = None
            try:
                parent_cache = sys.modules["jax"].config.jax_compilation_cache_dir
                if parent_cache:
                    jax_cache_dir = parent_cache
            except Exception:
                pass
        process = ctx.Process(
            target=_worker,
            args=(
                module_name, function_name, kind, config, all_flag,
                log_queue, progress_queue, preview_queue, jax_platform,
                jax_cache_dir, step_kwargs,
            ),
            daemon=True,
        )
        process.start()
        handle = WorkerHandle(
            step=step,
            process=process,
            log_queue=log_queue,
            progress_queue=progress_queue,
            preview_queue=preview_queue,
        )
        self.workers.append(handle)
        self.state["last_step"] = step
        self.state.setdefault("history", []).append(
            {"step": step, "config": config, "started_at": handle.started_at}
        )
        self.state["history"] = self.state["history"][-50:]
        self.save_cache()
        return handle

    def stop_all(self) -> None:
        for handle in self.workers:
            handle.stop()


def run_step_in_worker(step: str, config_path: str):
    """Back-compat helper: spawn a step, return (process, log_queue)."""
    session = GuiSession(cache_path=Path("/tmp/darsia_tpu_gui_compat.json"))
    handle = session.start_step(step, config_path)
    return handle.process, handle.log_queue


# --------------------------------------------------------------------- Tk


def launch_gui(config_path=None) -> None:
    """Tk shell over :class:`GuiSession`: step buttons, log pane, progress
    bar, and streamed preview images."""
    try:
        import tkinter as tk
        from tkinter import filedialog, scrolledtext, ttk
    except Exception as e:
        raise RuntimeError(
            "Tkinter is not available in this environment. Use the CLI "
            "front-ends instead, e.g. python -m "
            "darsia_tpu.presets.workflows.user_interface_analysis "
            "--config config.toml --mass"
        ) from e

    session = GuiSession()
    if config_path is not None:
        session.set_config(config_path)

    root = tk.Tk()
    root.title("darsia_tpu workflows")

    # Top bar: config chooser + all-images toggle.
    top = tk.Frame(root)
    top.pack(fill="x")
    config_var = tk.StringVar(value=session.state.get("config") or "")
    all_var = tk.BooleanVar(value=bool(session.state.get("all_images")))

    def choose_config() -> None:
        chosen = filedialog.askopenfilename(filetypes=[("TOML", "*.toml")])
        if chosen:
            session.set_config(chosen)
            config_var.set(chosen)

    tk.Button(top, text="Choose config", command=choose_config).pack(
        side="left"
    )
    tk.Label(top, textvariable=config_var, anchor="w").pack(
        side="left", fill="x", expand=True
    )
    tk.Checkbutton(top, text="all images", variable=all_var).pack(side="right")

    # Step buttons grouped by category + per-step parameter form.
    from .gui_support import BatchMonitor, PreviewStore, step_parameters

    buttons = tk.Frame(root)
    buttons.pack(fill="x")
    form_frame = tk.LabelFrame(root, text="Step options")
    form_frame.pack(fill="x")
    form_vars: dict = {}
    selected_step = tk.StringVar(value="")

    def build_form(step: str) -> None:
        """Render the step's parameter form (gui_support registry)."""
        for child in form_frame.winfo_children():
            child.destroy()
        form_vars.clear()
        selected_step.set(step)
        for col, spec in enumerate(step_parameters(step)):
            if spec.type == "bool":
                var = tk.BooleanVar(value=bool(spec.default))
                tk.Checkbutton(
                    form_frame, text=spec.label, variable=var
                ).grid(row=0, column=col, sticky="w")
            else:
                var = tk.StringVar(
                    value="" if spec.default is None else str(spec.default)
                )
                tk.Label(form_frame, text=spec.label).grid(
                    row=0, column=2 * col, sticky="w"
                )
                tk.Entry(form_frame, textvariable=var, width=12).grid(
                    row=0, column=2 * col + 1, sticky="w"
                )
            form_vars[spec.name] = var

    progress = ttk.Progressbar(root, maximum=1.0)
    progress.pack(fill="x")
    status_var = tk.StringVar(value="idle")
    tk.Label(root, textvariable=status_var, anchor="w").pack(fill="x")
    monitor = BatchMonitor()
    previews = PreviewStore()

    log_box = scrolledtext.ScrolledText(root, width=110, height=20)
    log_box.pack(fill="both", expand=True)
    preview_bar = tk.Frame(root)
    preview_bar.pack(fill="x")
    preview_key = tk.StringVar(value="")
    preview_menu = ttk.Combobox(
        preview_bar, textvariable=preview_key, state="readonly", width=40
    )
    preview_menu.pack(side="left")
    preview_label = tk.Label(root)
    preview_label.pack()
    preview_ref = {"image": None}

    def log(message: str) -> None:
        log_box.insert(tk.END, message + "\n")
        log_box.see(tk.END)

    def on_progress(event) -> None:
        if isinstance(event, dict):
            monitor.update(event)
            progress["value"] = monitor.percent() / 100.0
            status_var.set(monitor.text())

    def render_preview() -> None:
        try:
            key = preview_key.get()
            if key and key in previews.keys():
                previews.select(key)
            arr = previews.as_display()
            if arr is None:
                return
            import tkinter as tk  # noqa: F811

            height, width = arr.shape[:2]
            photo = tk.PhotoImage(width=width, height=height)
            rows = "{" + "} {".join(
                " ".join(
                    f"#{r:02x}{g:02x}{b:02x}" for r, g, b in row
                )
                for row in arr
            ) + "}"
            photo.put(rows)
            preview_label.configure(image=photo)
            preview_ref["image"] = photo
        except Exception:
            pass

    def on_preview(images: dict) -> None:
        previews.update(images)
        preview_menu["values"] = previews.keys()
        if not preview_key.get() and previews.selected:
            preview_key.set(previews.selected)
        render_preview()

    preview_menu.bind("<<ComboboxSelected>>", lambda _e: render_preview())

    def poll() -> None:
        for handle in list(session.workers):
            handle.poll(on_log=log, on_progress=on_progress,
                        on_preview=on_preview)
            if handle.finished and not handle.alive():
                status_var.set(
                    f"{handle.step} "
                    + ("FAILED" if handle.failed else "finished")
                )
                session.workers.remove(handle)
        root.after(250, poll)

    def start(step: str) -> None:
        session.state["all_images"] = bool(all_var.get())
        options = {"all_images": bool(all_var.get())}
        if selected_step.get() == step:
            for name, var in form_vars.items():
                options[name] = var.get()
        try:
            handle = session.start_step(
                step, config_var.get() or None, options=options
            )
        except (KeyError, ValueError) as exc:
            log(str(exc))
            return
        log(f"Started {step} (pid {handle.process.pid}).")

    def select_and_start(step: str) -> None:
        if selected_step.get() != step:
            build_form(step)  # first click shows the form
            return
        start(step)

    for i, step in enumerate(STEP_REGISTRY):
        tk.Button(
            buttons, text=step, command=lambda s=step: select_and_start(s)
        ).grid(row=i // 5, column=i % 5, sticky="ew")

    poll()
    root.protocol("WM_DELETE_WINDOW", lambda: (session.stop_all(), root.destroy()))
    root.mainloop()


def main(argv=None) -> None:
    config = argv[0] if argv else (sys.argv[1] if len(sys.argv) > 1 else None)
    launch_gui(config)


if __name__ == "__main__":
    main()
