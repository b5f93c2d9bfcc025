.PHONY: test oracle bench scaling package lint

test:
	python -m pytest tests/ -q

oracle:
	python tools/check_oracle.py

bench:
	python bench.py

scaling:
	python tools/bench_scaling.py 2

# spark-submit --py-files payload: the whole engine as one zip
package:
	mkdir -p dist
	rm -f dist/gdal_spark.zip
	cd /root/repo && zip -qr dist/gdal_spark.zip gdal_spark -x '*__pycache__*'
	@echo "dist/gdal_spark.zip ready: spark-submit --py-files dist/gdal_spark.zip <job.py>"

lint:
	python -m pytest tests/test_plans.py -q
