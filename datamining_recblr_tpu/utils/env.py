"""Runtime environment report.

Equivalent of the reference's end-of-run ``get_environment`` resource
table (reference ``run.py:93-97``; rendered at log:319-325): device
inventory, platform, and per-device memory statistics."""

from __future__ import annotations

import platform

import jax


def environment_report() -> dict:
    devices = jax.devices()
    report = {
        "backend": jax.default_backend(),
        "device_count": len(devices),
        "process_count": jax.process_count(),
        "devices": [str(d) for d in devices],
        "python": platform.python_version(),
        "jax": jax.__version__,
    }
    mem = []
    for d in devices:
        try:
            stats = d.memory_stats()
            if stats:
                mem.append(
                    {
                        "device": str(d),
                        "bytes_in_use": stats.get("bytes_in_use"),
                        "bytes_limit": stats.get("bytes_limit"),
                        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                    }
                )
        except Exception:
            pass
    report["memory"] = mem
    return report


def format_environment(report: dict | None = None) -> str:
    report = report or environment_report()
    lines = [
        f"backend={report['backend']} devices={report['device_count']} "
        f"processes={report['process_count']} jax={report['jax']}"
    ]
    for m in report.get("memory", []):
        peak = m.get("peak_bytes_in_use")
        limit = m.get("bytes_limit")
        if peak is not None and limit:
            lines.append(
                f"  {m['device']}: peak {peak / 2**30:.2f} GiB / "
                f"{limit / 2**30:.2f} GiB"
            )
    return "\n".join(lines)
