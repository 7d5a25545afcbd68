#!/usr/bin/env python
"""Multi-host pod-slice launcher (SURVEY §5.8, BASELINE 70B config).

Run ONE copy per host (e.g. via `gcloud compute tpus tpu-vm ssh --worker=all`):

    python tools/launch_multihost.py --config engine.json \
        [--coordinator host0:8476 --num-processes N --process-id I]

On TPU pod slices jax.distributed auto-detects the topology, so the three
coordinator flags are usually unnecessary.  Host 0 serves HTTP; other hosts
join the same jitted computations through GSPMD (all hosts must execute the
same program order — the scheduler broadcasts work via host 0's HTTP front
end and jax's SPMD execution model).

Layout: the ('data', 'model') mesh spans every chip in the slice; weights
and KV cache shard over `model` (ICI within hosts, DCN across), per
tpu_llama.parallel.sharding.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    args = ap.parse_args()

    import jax

    from tpu_llama.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    print(f"process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global devices")

    from tpu_llama.utils import EngineConfig

    cfg = EngineConfig.load(args.config)
    engine, tok = cfg.build_engine()

    if jax.process_index() == 0:
        from tpu_llama.runtime.server import LlamaServer

        srv = LlamaServer(engine, tok, host="0.0.0.0", port=cfg.server.port,
                          request_log=cfg.server.request_log,
                          watchdog_s=cfg.server.watchdog_s).start()
        print(f"host 0 serving on :{srv.port}")
        import threading

        threading.Event().wait()
    else:
        # non-zero hosts participate in the SPMD computations dispatched by
        # host 0; with GSPMD + jit this happens through the runtime — keep
        # the process alive.
        import threading

        threading.Event().wait()


if __name__ == "__main__":
    main()
