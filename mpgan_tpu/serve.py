"""Persistent inference serving over a Unix-domain socket.

The reference has no serving story — inference is a batch CLI sweep that
pays graph build + checkpoint restore on every invocation (SURVEY.md §3.3;
file:line citations unavailable, reference mount empty at survey time). For
production serving the model should be loaded and compiled ONCE and stay
warm: this module keeps the jitted two/three-pass upscaler resident and
answers volume requests over a local socket, so a render farm / viewer can
stream frames at device speed instead of process-startup speed.

Wire protocol (all integers little-endian u32):

    request:   b"MPSR" | version=1 | z y x c | f32 payload (z*y*x*c)
               b"MPQT"                                  -> orderly shutdown
    response:  b"MPOK" | z y x c | f32 payload          (success)
               b"MPER" | length  | utf-8 message        (failure)

One request per connection round-trip; a connection may issue many
sequentially. Concurrent connections are accepted; device dispatch is
serialized (the model is one device program — overlap comes from the
request threads doing socket I/O while another request computes).
"""

from __future__ import annotations

import os
import socket
import struct
import threading

import numpy as np

MAGIC_REQ = b"MPSR"
MAGIC_QUIT = b"MPQT"
MAGIC_OK = b"MPOK"
MAGIC_ERR = b"MPER"
VERSION = 1
# guards against garbage headers allocating absurd buffers: 1024³ single-
# channel f32 (4 GiB) is the largest volume a request may describe
MAX_VOXELS = 1024 ** 3


def _recv_exact(conn: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = conn.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError(f"peer closed after {len(buf)}/{n} bytes")
        buf.extend(chunk)
    return bytes(buf)


def _send_err(conn: socket.socket, msg: str) -> None:
    data = msg.encode()
    conn.sendall(MAGIC_ERR + struct.pack("<I", len(data)) + data)


class InferenceServer:
    """Serve ``upscale(lr_volume) -> hr_volume`` requests on a Unix socket.

    ``upscale`` takes a float32 ``(z, y, x, c)`` array and returns the
    super-resolved ``(Z, Y, X, 1)`` density (e.g. the jitted callable from
    ``infer.assemble.make_jitted_upscaler``). ``expect_channels`` rejects
    requests whose channel count cannot feed the loaded model (a mismatch
    would retrace and then fail inside the conv stack with a shape error
    that means nothing to the client).
    """

    def __init__(self, upscale, sock_path: str, expect_channels: int = 0):
        self._upscale = upscale
        self._expect_c = expect_channels
        self._path = sock_path
        self._device_lock = threading.Lock()
        self._shutdown = threading.Event()
        if os.path.exists(sock_path):
            # only remove a STALE socket: silently unlinking a live server's
            # socket would leave it running (and holding the device) but
            # unreachable, with no error anywhere
            probe = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            probe.settimeout(1.0)
            try:
                probe.connect(sock_path)
                live = True
            except (ConnectionRefusedError, FileNotFoundError):
                live = False  # stale socket from a dead server
            except socket.timeout:
                # a connect TIMEOUT on a unix socket means a LIVE server
                # with a full accept backlog — unlinking it would strand
                # the running server exactly as this guard tries to prevent
                live = True
            finally:
                probe.close()
            if live:
                raise RuntimeError(
                    f"a live server is already bound to {sock_path}; "
                    "pick another 'sock' path or shut the old one down")
            os.remove(sock_path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.bind(sock_path)
        self._sock.listen(16)
        self._sock.settimeout(0.5)  # poll the shutdown flag in accept()

    def warm(self, shape: tuple[int, int, int, int]) -> None:
        """Compile (and page in) the upscaler for one LR shape up front."""
        lr = np.zeros(shape, np.float32)
        np.asarray(self._upscale(lr))

    def serve_forever(self) -> None:
        threads = []
        try:
            while not self._shutdown.is_set():
                try:
                    conn, _ = self._sock.accept()
                except socket.timeout:
                    continue
                t = threading.Thread(target=self._handle, args=(conn,),
                                     daemon=True)
                t.start()
                threads.append(t)
                threads = [t for t in threads if t.is_alive()]
        finally:
            # let in-flight requests finish and answer: a request can
            # legitimately hold the device for minutes (cold remote compile
            # of a new LR shape), and clipping the join here would kill it
            # with neither MPOK nor MPER on the wire
            for t in threads:
                t.join(timeout=900)
            self._sock.close()
            if os.path.exists(self._path):
                os.remove(self._path)

    def _recv_magic(self, conn: socket.socket) -> bytes | None:
        """Read the next 4-byte magic, polling the shutdown flag.

        Between requests a keep-alive connection parks here; a plain 600 s
        recv would make shutdown block on every idle viewer. Short timeouts
        + re-check let idle handlers exit within ~1 s of shutdown while
        partial reads are preserved. Returns None on shutdown/peer close.
        """
        buf = bytearray()
        conn.settimeout(1.0)
        try:
            while not self._shutdown.is_set():
                try:
                    chunk = conn.recv(4 - len(buf))
                except socket.timeout:
                    continue
                if not chunk:
                    return None
                buf.extend(chunk)
                if len(buf) == 4:
                    return bytes(buf)
            return None
        finally:
            conn.settimeout(600)

    def _handle(self, conn: socket.socket) -> None:
        with conn:
            conn.settimeout(600)
            while not self._shutdown.is_set():
                try:
                    magic = self._recv_magic(conn)
                except (ConnectionError, OSError):
                    return
                if magic is None:
                    return
                if magic == MAGIC_QUIT:
                    conn.sendall(MAGIC_OK + struct.pack("<4I", 0, 0, 0, 0))
                    self._shutdown.set()
                    return
                if magic != MAGIC_REQ:
                    _send_err(conn, f"bad magic {magic!r}")
                    return
                try:
                    if not self._one_request(conn):
                        return
                except (ConnectionError, socket.timeout):
                    return
                except Exception as e:  # report, keep serving others
                    try:
                        _send_err(conn, f"{type(e).__name__}: {e}")
                    except OSError:
                        pass
                    return

    def _one_request(self, conn: socket.socket) -> bool:
        """Serve one request; False = the connection must be closed."""
        ver, z, y, x, c = struct.unpack("<5I", _recv_exact(conn, 20))
        n = z * y * x * c
        if not 0 < n <= MAX_VOXELS:
            # cannot resync without reading an unbounded payload
            _send_err(conn, f"volume {z}x{y}x{x}x{c} out of range")
            return False
        # always drain the payload BEFORE any validation error: the client
        # sent header+payload in one write, and a connection may issue many
        # sequential requests — erroring with the payload unread would make
        # the next header read see payload bytes as a bogus magic
        payload = _recv_exact(conn, 4 * n)
        if ver != VERSION:
            _send_err(conn, f"protocol version {ver} != {VERSION}")
            return True
        if self._expect_c and c != self._expect_c:
            _send_err(conn, f"expected {self._expect_c} channels "
                            f"(model conditioning), got {c}")
            return True
        lr = np.frombuffer(payload, "<f4").reshape(z, y, x, c)
        with self._device_lock:  # one device program at a time
            hr_dev = self._upscale(lr)
        # device→host fetch OUTSIDE the lock: the transfer is the dominant
        # per-request cost on a tunneled backend and must overlap the next
        # request's dispatch
        hr = np.ascontiguousarray(np.asarray(hr_dev, dtype=np.float32))
        # two sends, zero copies: hdr + hr.tobytes() would allocate the
        # whole volume twice more (~1 GB transient at 512^3)
        conn.sendall(MAGIC_OK + struct.pack("<4I", *hr.shape))
        conn.sendall(memoryview(hr).cast("B"))
        return True


class Client:
    """Minimal blocking client for :class:`InferenceServer`.

    >>> with Client("/tmp/mpgan.sock") as c:
    ...     hr = c.upscale(lr)        # (z,y,x,c) f32 -> (Z,Y,X,1) f32
    """

    def __init__(self, sock_path: str, timeout: float = 1200.0):
        # default timeout covers a cold remote compile (2-10 min observed on
        # the tunneled backend) when the server was started without warmShape
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.settimeout(timeout)
        self._sock.connect(sock_path)

    def upscale(self, vol: np.ndarray) -> np.ndarray:
        vol = np.ascontiguousarray(vol, dtype=np.float32)
        if vol.ndim == 3:
            vol = vol[..., None]
        if vol.ndim != 4:
            raise ValueError(f"need (z,y,x,c), got shape {vol.shape}")
        self._sock.sendall(MAGIC_REQ + struct.pack("<5I", VERSION, *vol.shape))
        self._sock.sendall(memoryview(vol).cast("B"))  # zero-copy payload
        return self._read_response()

    def shutdown_server(self) -> None:
        self._sock.sendall(MAGIC_QUIT)
        _recv_exact(self._sock, 4 + 16)  # MPOK + zero dims

    def _read_response(self) -> np.ndarray:
        magic = _recv_exact(self._sock, 4)
        if magic == MAGIC_ERR:
            (ln,) = struct.unpack("<I", _recv_exact(self._sock, 4))
            raise RuntimeError("server: " +
                               _recv_exact(self._sock, ln).decode())
        if magic != MAGIC_OK:
            raise RuntimeError(f"bad response magic {magic!r}")
        z, y, x, c = struct.unpack("<4I", _recv_exact(self._sock, 16))
        data = _recv_exact(self._sock, 4 * z * y * x * c)
        return np.frombuffer(data, "<f4").reshape(z, y, x, c).copy()

    def close(self) -> None:
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
