#include <opencv2/core.hpp>
#include <opencv2/imgproc.hpp>
#include <cstdio>
int main() {
    cv::RNG rng(99);
    // tiles 1x1: output = LUT[src] exactly (weights collapse)
    for (double clip : {0.5, 1.3354/16*256.0, 2.0, 8.0, 40.0, 300.0}) {
        cv::Mat src(5, 7, CV_8UC1);
        rng.fill(src, cv::RNG::UNIFORM, 0, 256);
        cv::Mat dst;
        cv::createCLAHE(clip, cv::Size(1,1))->apply(src, dst);
        printf("clip %.10g\nsrc:", clip);
        for (int i=0;i<35;i++) printf(" %d", src.data[i]);
        printf("\ndst:");
        for (int i=0;i<35;i++) printf(" %d", dst.data[i]);
        printf("\n");
    }
    return 0;
}
