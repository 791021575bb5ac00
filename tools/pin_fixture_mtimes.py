#!/usr/bin/env python3
"""Re-pin the fixed mtimes of the route fixtures (P5: LastModified is
oracle-checked, and git checkouts reset file mtimes to "now", which would
fail q_file_metadata's golden). Scheme matches gen_fixtures.py: sorted
non-config data files get ROUTE_MTIME_BASE + i*3600.

graft.Verify re-applies the same pinning at startup (self-healing for the
driver's gate); this script exists for manual repair / inspection."""
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "route")
ROUTE_MTIME_BASE = 1705320000  # 2024-01-15T12:00:00Z

keys = []
for dirpath, _, files in os.walk(ROOT):
    for f in files:
        if f != "config.ini":
            keys.append(os.path.relpath(os.path.join(dirpath, f), ROOT))
for i, key in enumerate(sorted(keys)):
    path = os.path.join(ROOT, key)
    os.utime(path, (ROUTE_MTIME_BASE + i * 3600,) * 2)
    print(f"{key} -> {ROUTE_MTIME_BASE + i * 3600}")
