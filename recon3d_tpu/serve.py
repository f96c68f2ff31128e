"""Top-level alias: `python -m recon3d_tpu.serve` == runtime/serve.py.

The persistent reconstruction service lives in recon3d_tpu.runtime.serve;
this shim gives it the short invocation the docs use."""

from recon3d_tpu.runtime.serve import (  # noqa: F401
    DEFAULT_SOCKET,
    ReconstructionServer,
    ensure_server,
    main,
    ping,
    request,
    shutdown,
)

if __name__ == "__main__":
    import sys

    sys.exit(main())
