import sys
sys.path.insert(0, "/root/repo")
import importlib
import bench
importlib.reload(bench)
bench.main()
