# Developer entry points
.PHONY: test native bench bench-train bench-stream clean

test:
	python -m pytest tests/ -x -q

native:
	cmake -B native/build -G Ninja native && ninja -C native/build

bench:
	python bench.py

bench-train:
	python tools/evaluation/bench_train.py

bench-stream:
	python tools/evaluation/bench_streaming.py

clean:
	rm -rf native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
