"""Long-lived chip worker: executes python snippets dropped into
/tmp/chip_jobs/, keeping one process (and its loaded TPU executables)
alive across experiments — the tunneled compile service is flaky with
long bad windows, so programs that made it on-chip once must be reused
from the in-process executable cache rather than reloaded per script.

Protocol: write <name>.py into /tmp/chip_jobs/ ; the daemon runs it with
``exec`` in a persistent namespace (so state like loaded programs and
captured systems carries over), streaming stdout/stderr + a final
"===DONE <name> (ok|err)" marker into /tmp/chip_jobs/<name>.out.
"""

import io
import os
import sys
import time
import traceback

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOBS = "/tmp/chip_jobs"
os.makedirs(JOBS, exist_ok=True)

import jax

jax.config.update("jax_platforms", "cpu,axon")

import jax.numpy as jnp  # noqa: F401
import numpy as np  # noqa: F401

from ttipm_tpu import config as cfg

cfg.enable_persistent_cache()
cfg.set_dtype(jnp.float32)

NS = {"jax": jax, "jnp": jnp, "np": np, "cfg": cfg}
print("[daemon] ready", flush=True)

seen = set()
while True:
    for fn in sorted(os.listdir(JOBS)):
        if not fn.endswith(".py") or fn in seen:
            continue
        seen.add(fn)
        path = os.path.join(JOBS, fn)
        out_path = path[:-3] + ".out"
        print(f"[daemon] running {fn}", flush=True)
        buf = io.StringIO()
        old_out, old_err = sys.stdout, sys.stderr
        ok = True
        try:
            sys.stdout = sys.stderr = buf
            with open(path) as fh:
                code = fh.read()
            exec(compile(code, path, "exec"), NS)
        except BaseException:  # noqa: BLE001 — report and keep serving
            ok = False
            traceback.print_exc()
        finally:
            sys.stdout, sys.stderr = old_out, old_err
        with open(out_path, "w") as fh:
            fh.write(buf.getvalue())
            fh.write(f"\n===DONE {fn} {'ok' if ok else 'err'}\n")
        print(f"[daemon] {fn} -> {'ok' if ok else 'err'}", flush=True)
    time.sleep(1.0)
