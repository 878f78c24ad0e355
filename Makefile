# sat_tpu developer targets
.PHONY: test test-fast bench native demo smoke serve loadtest

# captioning daemon (set MODEL=path/to/model.npz)
serve:
	python serve.py --model $(MODEL) --port 8765

# load generator against a running daemon (set IMAGES=dir)
loadtest:
	python tools/load_test.py --port 8765 --images $(IMAGES)

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow" --ignore=tests/test_engine.py \
	  --ignore=tests/test_encoder.py --ignore=tests/test_bert_path.py \
	  --ignore=tests/test_feature_cache.py \
	  --ignore=tests/test_multiprocess.py

native:
	sh tools/build_native.sh

bench:
	python bench.py

demo:
	python tools/demo_learnability.py

smoke:
	python train.py --data data/flickr8k --epochs=1 --frac=0.02 \
	  --log-interval=2 --tf --ado --attention
