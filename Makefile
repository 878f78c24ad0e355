# sat_tpu developer targets
.PHONY: test test-fast test-heavy bench native demo smoke serve loadtest

# captioning daemon (set MODEL=path/to/model.npz)
serve:
	python serve.py --model $(MODEL) --port 8765

# load generator against a running daemon (set IMAGES=dir)
loadtest:
	python tools/load_test.py --port 8765 --images $(IMAGES)

test:
	python -m pytest tests/ -q

# Core tier: the fast regression contract (<15 min on the 1-core pod).
test-fast:
	python -m pytest tests/ -q -m "not slow and not heavy"

# Heavy tier: multi-minute suites (feature cache ~30 min, multiprocess,
# engine, encoder/bert goldens, serve). Full-tree certification =
# test-fast + test-heavy, or just `make test` (~75 min; run suites one at
# a time on this 1-core pod — two CPU-heavy jobs at once both time out).
test-heavy:
	python -m pytest tests/ -q -m "heavy or slow"

native:
	sh tools/build_native.sh

bench:
	python bench.py

demo:
	python tools/demo_learnability.py

smoke:
	python train.py --data data/flickr8k --epochs=1 --frac=0.02 \
	  --log-interval=2 --tf --ado --attention
