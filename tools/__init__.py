"""Offline tools (reference's tools/ directory re-designed):
vocabulary conversion (bin_vocabulary.cc) and point-cloud meshing
(matlab/mesh_from_pointcloud.m)."""
