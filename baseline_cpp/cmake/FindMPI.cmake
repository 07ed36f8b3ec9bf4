# Satisfy the reference's find_package(MPI REQUIRED) with the single-rank
# header stub in ../mpi_stub (this image ships no MPI headers).
set(MPI_FOUND TRUE)
set(MPI_CXX_FOUND TRUE)
set(MPI_C_FOUND TRUE)
get_filename_component(_stub_dir "${CMAKE_CURRENT_LIST_DIR}/../mpi_stub" ABSOLUTE)
set(MPI_INCLUDE_PATH "${_stub_dir}")
set(MPI_CXX_INCLUDE_PATH "${_stub_dir}")
set(MPI_C_INCLUDE_PATH "${_stub_dir}")
set(MPI_LIBRARIES "")
set(MPI_CXX_LIBRARIES "")
if(NOT TARGET MPI::MPI_CXX)
  add_library(MPI::MPI_CXX INTERFACE IMPORTED)
  set_target_properties(MPI::MPI_CXX PROPERTIES
    INTERFACE_INCLUDE_DIRECTORIES "${_stub_dir}")
endif()
if(NOT TARGET MPI::MPI_C)
  add_library(MPI::MPI_C INTERFACE IMPORTED)
  set_target_properties(MPI::MPI_C PROPERTIES
    INTERFACE_INCLUDE_DIRECTORIES "${_stub_dir}")
endif()
