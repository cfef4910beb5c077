# Developer entry points. The env dance: this machine routes every python
# process to a remote TPU via a sitecustomize on PYTHONPATH; tests want the
# fast local CPU backend with 8 virtual devices (conftest re-execs too, but
# the explicit env avoids one interpreter start).

CPUENV = PYTHONPATH=$(CURDIR) JAX_PLATFORMS=cpu \
         XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_cpu_collective_call_terminate_timeout_seconds=3600 --xla_cpu_collective_call_warn_stuck_timeout_seconds=600" \
         DEHAZE_TPU_TEST_REEXEC=1

.PHONY: test test-fast bench bench-suite graft lint

test:
	$(CPUENV) python -m pytest tests/ -q

test-fast:
	$(CPUENV) python -m pytest tests/ -q -x -m "not slow"

bench:           # real TPU (axon env), whole-image throughput, one JSON line
	python bench.py

bench-suite:     # real TPU: patch fwd + train-step throughput
	PYTHONPATH=/root/.axon_site:$(CURDIR) python -m dehaze_tpu.cli.bench_suite

graft:
	python __graft_entry__.py
	$(CPUENV) python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
