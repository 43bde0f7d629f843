package weka.classifiers.trees;
import weka.classifiers.Classifier;
import weka.core.Instances;
public class RandomForest implements Classifier {
    public void buildClassifier(Instances data) { throw new UnsupportedOperationException("weka stub"); }
}
