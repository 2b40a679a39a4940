.PHONY: native test bench clean

native: ddiffpg_tpu/modes/libcluster.so

ddiffpg_tpu/modes/libcluster.so: runtime/cluster.cpp
	g++ -O3 -Wall -shared -fPIC $< -o $@

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	rm -f ddiffpg_tpu/modes/libcluster.so
