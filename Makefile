PYTHONPATH := $(CURDIR):$(PYTHONPATH)
export PYTHONPATH

.PHONY: test test-fast bench demo multichip clean-native

test:            ## full suite (CPU, 8 virtual devices via tests/conftest.py)
	python -m pytest tests/ -q

test-fast:       ## everything except the end-to-end pipeline test
	python -m pytest tests/ -q --ignore=tests/test_pipeline.py

test-ab:         ## opt-in A/B vs the reference's own C++ (builds from its tree)
	PSNERF_REF_AB=1 python -m pytest tests/test_mesh_ab.py -q

parity-e2e:      ## opt-in end-to-end parity vs the live torch reference
	PSNERF_REF_E2E=1 python tools/parity_e2e.py

bench:           ## headline benchmark on the attached TPU chip (one JSON line)
	python bench.py

demo:            ## full two-stage pipeline on a synthetic scene (TPU, ~8 min)
	python tools/tpu_pipeline_demo.py --workdir /tmp/psnerf_demo

multichip:       ## validate the sharded train step on 8 virtual CPU devices
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean-native:    ## force-rebuild the C++ mesh library
	rm -f psnerf_tpu/mesh/csrc/libpsmesh.so
