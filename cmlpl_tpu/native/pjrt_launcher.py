"""Build + launch the native PJRT serving host (pjrt_host.cc).

The host binary is plugin-agnostic C++ (PJRT C API only); everything
image-specific lives here:

- **build**: on-demand ``g++`` compile of ``pjrt_host.cc`` against the
  ``pjrt_c_api.h`` shipped in this image (tensorflow's include tree),
  cached next to the patch-ops kernel (same pattern as
  ``native/binding.py``).
- **plugin discovery**: ``PJRT_LIBRARY_PATH`` env, then the axon tunnel
  plugin, then ``libtpu.so`` — the first loadable ``.so`` wins.
- **client options**: the axon plugin needs the same named options the
  Python side passes in ``axon.register`` (topology / session_id /
  remote_compile / rank) plus relay env vars; libtpu needs none.

The reference repo has no native serving at all (its deployment story
is re-running train.py — train.py:291-309); this module + pjrt_host.cc
are the TPU-production equivalent: compile an exported StableHLO bundle
once, execute many times, no Python in the hot path.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
import uuid
from typing import Optional, Sequence

_SRC = os.path.join(os.path.dirname(__file__), "pjrt_host.cc")

# rust u32::MAX — the monoclient rank sentinel (axon.register.MULTIHOST_RANK)
_MONOCLIENT_RANK = 0xFFFF_FFFF


def _find_pjrt_header_root() -> Optional[str]:
    """Locate an include root that provides
    tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h."""
    candidates = []
    try:
        import tensorflow as _tf  # noqa: F401 — only for its include tree

        candidates.append(os.path.join(os.path.dirname(_tf.__file__),
                                       "include"))
    except Exception:
        pass
    import sysconfig

    site = sysconfig.get_paths().get("purelib", "")
    candidates.append(os.path.join(site, "tensorflow", "include"))
    for root in candidates:
        if os.path.exists(os.path.join(
                root, "tensorflow", "compiler", "xla", "pjrt", "c",
                "pjrt_c_api.h")):
            return root
    return None


def _build(src: str, out_name: str, *, compile_flags: Sequence[str] = (),
           link_flags: Sequence[str] = (),
           force: bool = False) -> Optional[str]:
    """g++-compile ``src`` into the shared native cache; mtime-cached.
    Returns the artifact path, or None without a toolchain/header."""
    cache = os.environ.get(
        "CMLPL_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "cmlpl_tpu_native"))
    os.makedirs(cache, exist_ok=True)
    out_path = os.path.join(cache, out_name)
    if (not force and os.path.exists(out_path)
            and os.path.getmtime(out_path) >= os.path.getmtime(src)):
        return out_path
    inc = _find_pjrt_header_root()
    if inc is None:
        return None
    cmd = (["g++", "-O2", "-std=c++17", "-I", inc] + list(compile_flags)
           + [src, "-o", out_path + ".tmp"] + list(link_flags))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(out_path + ".tmp", out_path)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return out_path


def build_host(force: bool = False) -> Optional[str]:
    """Compile pjrt_host.cc to a cached binary; returns its path or
    None when no toolchain / header is available."""
    return _build(_SRC, "pjrt_host", link_flags=["-ldl"], force=force)


_STUB_SRC = os.path.join(os.path.dirname(__file__), "pjrt_stub_plugin.cc")


def build_stub_plugin(force: bool = False) -> Optional[str]:
    """Compile the loopback test plugin (pjrt_stub_plugin.cc) to a cached
    .so; returns its path or None without a toolchain/header."""
    return _build(_STUB_SRC, "pjrt_stub_plugin.so",
                  compile_flags=["-shared", "-fPIC"], force=force)


def discover_plugin() -> Optional[str]:
    """First usable PJRT plugin .so: env override, axon tunnel, libtpu."""
    cands = []
    if os.environ.get("PJRT_LIBRARY_PATH"):
        cands.append(os.environ["PJRT_LIBRARY_PATH"])
    cands.append("/opt/axon/libaxon_pjrt.so")
    try:
        import libtpu

        cands.append(os.path.join(os.path.dirname(libtpu.__file__),
                                  "libtpu.so"))
    except Exception:
        pass
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def client_options(plugin: str,
                   session_id: Optional[str] = None) -> list[str]:
    """``--copt k=v`` pairs for PJRT_Client_Create on this plugin.

    For the axon tunnel plugin this mirrors what
    ``axon.register.register(None, "<gen>:1x1x1", remote_compile=...)``
    passes from the image's sitecustomize; other plugins (libtpu on a
    real TPU VM) take no options.
    """
    if "axon" not in os.path.basename(plugin):
        return []
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    rc = 1 if os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1" else 0
    sid = session_id or str(uuid.uuid4())
    opts = {
        "remote_compile": rc,
        "local_only": 0,
        "priority": 0,
        "topology": f"{gen}:1x1x1",
        "n_slices": 1,
        "session_id": sid,
        "rank": _MONOCLIENT_RANK,
        # fail fast when the tunnel relay is down rather than spinning
        # in the claim-retry loop forever (observed outage 2026-08-18)
        "claim_timeout_s": int(os.environ.get("CMLPL_CLAIM_TIMEOUT_S",
                                              "300")),
    }
    out = []
    for k, v in opts.items():
        out += ["--copt", f"{k}={v}"]
    return out


def plugin_env(plugin: str) -> dict:
    """Process env for the host: inherited env + the relay/claim vars the
    axon plugin reads (normally set by the image's sitecustomize, which
    only runs for *Python* processes)."""
    env = dict(os.environ)
    if "axon" in os.path.basename(plugin):
        env.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
        env.setdefault("AXON_LOOPBACK_RELAY", "1")
        env.setdefault("AXON_COMPAT_VERSION", "49")
        env.setdefault("TPU_SKIP_MDS_QUERY", "1")
        env.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
        gen = env.get("PALLAS_AXON_TPU_GEN", "v5e")
        env.setdefault("TPU_TOPOLOGY", "1x1")
        env.setdefault("TPU_ACCELERATOR_TYPE",
                       {"v4": "v4-8", "v5e": "v5litepod-4",
                        "v5p": "v5p-8", "v6e": "v6e-4"}.get(gen, gen))
    return env


def run_host(bundle: str, cube_npy: str, spectra_npy: str, out_npy: str,
             *, plugin: Optional[str] = None, repeat: int = 1,
             extra_args: Sequence[str] = (),
             timeout: Optional[float] = None) -> str:
    """One-shot native inference; returns the host's stdout (one JSON
    line with client/compile/run timings)."""
    host = build_host()
    if host is None:
        raise RuntimeError("pjrt_host build failed (no g++ or header)")
    plugin = plugin or discover_plugin()
    if plugin is None:
        raise RuntimeError("no PJRT plugin .so found")
    cmd = [host, "--plugin", plugin, "--bundle", bundle,
           "--cube", cube_npy, "--spectra", spectra_npy,
           "--out", out_npy, "--repeat", str(repeat)]
    cmd += client_options(plugin)
    cmd += list(extra_args)
    proc = subprocess.run(cmd, env=plugin_env(plugin), capture_output=True,
                          text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"pjrt_host failed ({proc.returncode}):\n{proc.stderr}")
    return proc.stdout.strip()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bundle", required=True)
    p.add_argument("--cube", required=True)
    p.add_argument("--spectra", required=True)
    p.add_argument("--out", default="pred.npy")
    p.add_argument("--plugin", default=None)
    p.add_argument("--repeat", type=int, default=1)
    args = p.parse_args(argv)
    print(run_host(args.bundle, args.cube, args.spectra, args.out,
                   plugin=args.plugin, repeat=args.repeat))


if __name__ == "__main__":
    main()
