#!/usr/bin/env python
"""Contention generator for bench robustness testing: spins N CPU hogs and
M disk-writer loops (against a DISK path, to replicate a shared host whose
other tenants saturate CPU and the root volume). Run alongside bench/prof
to replicate the driver environment's load; kill with SIGTERM."""
import multiprocessing as mp
import os
import signal
import sys
import tempfile


def cpu_hog():
    x = 1.0
    while True:
        x = (x * 1.000001) % 1e9


def disk_hog(path):
    buf = os.urandom(4 * 1024 * 1024)
    i = 0
    while True:
        p = os.path.join(path, f"junk{i % 8}.bin")
        with open(p, "wb") as fh:
            for _ in range(16):  # 64 MB per file
                fh.write(buf)
            fh.flush()
            os.fsync(fh.fileno())
        i += 1


def main():
    n_cpu = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n_disk = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    d = tempfile.mkdtemp(prefix="contention_", dir="/var/tmp")
    procs = [mp.Process(target=cpu_hog) for _ in range(n_cpu)]
    procs += [mp.Process(target=disk_hog, args=(d,)) for _ in range(n_disk)]
    for p in procs:
        p.daemon = True
        p.start()
    print(f"contention: {n_cpu} cpu + {n_disk} disk hogs (dir {d}); pid {os.getpid()}", flush=True)

    def stop(*_):
        for p in procs:
            p.terminate()
        import shutil
        shutil.rmtree(d, ignore_errors=True)
        sys.exit(0)

    signal.signal(signal.SIGTERM, stop)
    signal.signal(signal.SIGINT, stop)
    signal.pause()


if __name__ == "__main__":
    main()
