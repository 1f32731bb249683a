.PHONY: test bench dist scaling clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# dist/dff.zip for spark-submit --py-files (north rule launch shape)
dist:
	mkdir -p dist
	rm -f dist/dff.zip
	cd . && zip -q -r dist/dff.zip dff -x '*__pycache__*'

scaling:
	python jobs/bench_scaling.py

clean:
	rm -rf .bench_data dist .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
