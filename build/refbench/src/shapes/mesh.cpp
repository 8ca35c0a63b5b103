
// Replacement for the assimp-based loader: reads a plain-text triangle
// soup (18 floats per line: Ax Ay Az Bx By Bz Cx Cy Cz ANx ... CNz) that
// the comparison harness exports from the TPU repo's mesh pipeline, so
// both renderers consume identical geometry and smooth normals.
#include "mesh.h"
#include "triangle.h"
#include <cstdio>

void Mesh::Create(_Create &createStruct)
{
    FILE *f = fopen(createStruct.loadPath.c_str(), "r");
    if (!f)
    {
        printf("Missing or empty mesh after assimp loading!\n");
        return;
    }
    Mesh::Attributes meshAttrs = {};
    meshAttrs.color = {0.1, 0.8, 0.3};
    m_meshAttributes.push_back(meshAttrs);

    Triangle::_Create t = {};
    float v[18];
    while (fscanf(f,
        "%f %f %f %f %f %f %f %f %f %f %f %f %f %f %f %f %f %f",
        &v[0], &v[1], &v[2], &v[3], &v[4], &v[5], &v[6], &v[7], &v[8],
        &v[9], &v[10], &v[11], &v[12], &v[13], &v[14], &v[15], &v[16],
        &v[17]) == 18)
    {
        t.A = {v[0], v[1], v[2]};
        t.B = {v[3], v[4], v[5]};
        t.C = {v[6], v[7], v[8]};
        t.AN = {v[9], v[10], v[11]};
        t.BN = {v[12], v[13], v[14]};
        t.CN = {v[15], v[16], v[17]};
        Triangle::create(t);
    }
    fclose(f);
}
